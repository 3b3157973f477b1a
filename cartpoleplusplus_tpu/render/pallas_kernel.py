"""Pallas TPU kernel: batched camera rendering of the cartpole++ scene.

The hand-tiled version of render/raycast.py — replaces Bullet's TinyRenderer
(`p.getCameraImage`, reference bullet_cartpole.py:~L120-150) on the TPU hot
path.  One `pallas_call` renders every camera for a tile of envs entirely in
VMEM.

Why a kernel at all: the XLA ray caster compiles into ~4 HBM-bounded fusions
per frame (two box cascades, field assembly, pooling/epilogue) whose
intermediates — num/den/shade/select planes at (envs, rays) — round-trip
through HBM between fusions; at 4096 envs that traffic rivals the cascade
compute itself (round-2 trace: or_select/broadcast_select fusions ≈
1.2 ms/frame).  In the kernel the whole pipeline — div-free slab cascades for
both boxes, depth ordering against the precomputed ground plane, Lambert
shading, the 4-field color decomposition, and obs_pool average-pooling —
runs on VMEM-resident tiles with zero HBM round-trips; only the pooled
(TILE_E, cams·3·stride) planes leave.

Layout contract (shared with raycast.pool_ray_layout): rays arrive permuted
into pool-offset-major, 128-lane-aligned blocks, so pooling inside the
kernel is ``pool²`` aligned lane-slice adds.  The static ray block carries
the screen-affine coords and the precomputed background (gray ground value
+ sky mask) — rows [px py gval smask] (round 3; the r2 layout spent three
rows on normalized directions, three on the constant eye, and one on a
ground depth whose occlusion test is redundant — see BASELINE.md roofline).

The cascade math is literally raycast._ray_obb_affine — the same
rank-polymorphic component-tuple function traces both XLA and Mosaic.
Equivalence with the XLA renderer is pinned by tests/test_pallas_render.py
(interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cartpoleplusplus_tpu.physics.bodies import RigidState, SceneParams
from cartpoleplusplus_tpu.render.camera import (
    DEFAULT_CAMERAS,
    Camera,
    ray_coords,
    ray_grid,
)
from cartpoleplusplus_tpu.render.raycast import (
    CART_COLOR,
    LIGHT_DIR,
    POLE_COLOR,
    SKY_COLOR,
    _AMBIENT,
    _BIG,
    _obb_q_cast,
    _obb_q_setup,
    _ray_obb_affine,
    pool_ray_layout,
    static_background,
)

LANE = 128
_ROWS = 8  # static per-ray rows [px py gval smask], padded to a sublane tile


def _build_ray_planes(cameras, h, w, pool: int = 1, samples: int = 0):
    """Static (8, cams·stride·p2) f32 block of per-ray constants.

    Rows: [px py ground_val sky_mask 0…] — the round-3 screen-affine layout
    (see raycast._ray_obb_affine): two static screen coords replace the three
    normalized direction rows, the camera eye is a closure constant instead
    of three origin rows, and the ground depth row is gone (boxes always
    occlude the ground in this scene).  Rays are in
    :func:`raycast.pool_ray_layout` order (pool-offset-major, tail-padded to
    128-aligned ``stride`` blocks) so in-kernel pooling is aligned slice
    adds; ``pool=1`` degenerates to one padded block per camera.

    Returns (block, cam_meta, (p2, n, stride)) with n = pooled pixels per
    camera and cam_meta a list of static (basis, eye) float tuples.
    """
    if pool > 1:
        sel, (p2, n, stride) = pool_ray_layout(pool, h, w, samples)
    else:
        n = h * w
        stride = -(-n // LANE) * LANE
        sel = np.concatenate([np.arange(n), np.full(stride - n, n - 1)])
        p2 = 1
    width = p2 * stride

    cols, cam_meta = [], []
    for cam in cameras:
        dirs, _ = ray_grid(cam, h, w)
        px, py, basis, eye = ray_coords(cam, h, w)
        gval, smask = static_background((dirs[:, 0], dirs[:, 1], dirs[:, 2]), eye)
        rows = np.zeros((_ROWS, width), np.float32)
        rows[0] = px[sel]
        rows[1] = py[sel]
        rows[2] = gval[sel]
        rows[3] = smask[sel]
        rows[4] = 1.0  # affine bias row: the MXU path's w = [B C · A]·[px py 1]
        cols.append(rows)
        cam_meta.append((basis, eye))
    return np.concatenate(cols, axis=1), cam_meta, (p2, n, stride)


_SETUP_W = 22  # per box: A(3) B(3) C(3) inv_u(3) inv_l(3) ahead(3) cand(3) inside


def _pack_setups(scene: SceneParams, cam_meta, poses: jnp.ndarray) -> jnp.ndarray:
    """Hoist the raster's per-env scalar setup out of the Mosaic kernel.

    ``_obb_q_setup`` is ~300 element ops per (box × camera × env) including
    six true divides — cheap per ray when amortized over a full 2500-ray
    camera frame, but the kernel evaluates it on (TILE_E, 1) columns (one
    VPU lane in 128) once per camera per env-tile, which round 4 measured
    as the dominant per-frame overhead at low rays-per-camera configs
    (config-5 raster at 0.57 of its census ceiling vs 0.88 for 1-cam exact;
    BASELINE.md round-4 race).  Evaluating it here, batched over ALL envs
    (and repeats) at full lane occupancy, costs microseconds and shrinks
    the kernel's per-frame work to the per-ray cascades.

    ``poses``: (..., 16) with any leading batch dims ((E,) or (R, E)).
    Returns f32 (..., n_cams · 2 · _SETUP_W): per camera, the cart box then
    the pole box, each the exact ``_obb_q_setup`` output tuple flattened in
    order (bool fields as 0.0/1.0).  Same IEEE expression tree as the
    in-kernel evaluation, so results are bit-identical.
    """
    f32 = poses.astype(jnp.float32)
    comp = lambda j: f32[..., j]
    boxes = (
        ((comp(0), comp(1), comp(2)),
         (comp(3), comp(4), comp(5), comp(6)), scene.cart_half_extents),
        ((comp(7), comp(8), comp(9)),
         (comp(10), comp(11), comp(12), comp(13)), scene.pole_half_extents),
    )
    cols = []
    for basis, eye in cam_meta:
        for center, quat, he in boxes:
            a3, b3, c3, iu, il, ahead, cand, inside = _obb_q_setup(
                basis, eye, center, quat, he, LIGHT_DIR
            )
            cols += [*a3, *b3, *c3, *iu, *il,
                     *(a.astype(jnp.float32) for a in ahead),
                     *cand, inside.astype(jnp.float32)]
    return jnp.stack(cols, axis=-1)


def _unpack_setup(scol):
    """Rebuild an ``_obb_q_setup`` tuple from packed (TILE_E, 1) columns."""
    g = lambda j: scol(j)
    a3 = (g(0), g(1), g(2))
    b3 = (g(3), g(4), g(5))
    c3 = (g(6), g(7), g(8))
    iu = (g(9), g(10), g(11))
    il = (g(12), g(13), g(14))
    ahead = tuple(g(15 + k) > 0.5 for k in range(3))
    cand = (g(18), g(19), g(20))
    inside = g(21) > 0.5
    return a3, b3, c3, iu, il, ahead, cand, inside


def _render_kernel(
    scene: SceneParams,
    cam_meta,
    p2: int,
    stride: int,
    recip: bool,
    raster: bool,
    mxu: bool,
    poses_ref,
    rays_ref,
    out_ref,
    setups_ref=None,
):
    """One env tile: cast + shade + pool all cameras' rays for TILE_E envs.

    Geometry runs in float32 (Mosaic rejects bf16 comparisons).  Color is
    produced through the 4-field decomposition of raycast._render_fields —
    cart/pole shade weights, background ground value, sky mask — as float
    MASK ARITHMETIC (Mosaic rejects selects whose operands are both scalar
    splats, so no jnp.where against constants).  Output: per camera, 3
    pooled color planes of ``stride`` lanes, quantized [0,255] but kept in
    the output dtype (uint8 stores are not universally supported).

    ``recip``: use Mosaic's one-op approximate reciprocal for slab times
    instead of the division-free ratio cascade (raced on chip; see
    BASELINE.md round-3 roofline).
    ``raster``: cast through the projective inverse-depth rasterizer
    (raycast._ray_obb_q) instead of either slab cascade — the round-3.5
    algorithm-class op diet (census 162 → 110 ops/ray); overrides ``recip``.
    ``mxu``: with ``raster``, evaluate all 18 routed bound planes (both
    boxes × 3 axes × {a, ub, lb} — ~48 of the 110 census VPU ops/ray:
    affine w evaluation, the inv_u/inv_l scalings, and the near-plane
    routing selects) as ONE f32 MXU matmul per camera: the static ray
    block IS the RHS (px/py rows + the ones bias row), the per-env
    coefficient columns stack to an (18·TILE_E, 8) LHS with the routing
    folded in (scales on the screen columns, ±BIG biases on the ones
    column).  Precision.HIGHEST keeps the passes f32-accurate; output can
    still differ from the VPU evaluation by ~1-2 ULP of each bound
    (different rounding order), which only matters on exact silhouette
    ties — the equivalence test bounds the differing-pixel fraction.
    Opt-in: the win depends on the Mosaic backend retiring the tiny-K
    matmul and its (18·TILE_E, width) result layout cheaply, which only
    the on-chip race can decide (scripts/chip_queue.sh).
    """
    dtype = jnp.float32
    width = p2 * stride
    recip_fn = (lambda v: pl.reciprocal(v, approx=True)) if recip else None
    col = lambda j: poses_ref[:, j : j + 1].astype(dtype)
    cart_c = (col(0), col(1), col(2))
    cart_q = (col(3), col(4), col(5), col(6))
    pole_c = (col(7), col(8), col(9))
    pole_q = (col(10), col(11), col(12), col(13))

    inv_p2 = 1.0 / p2
    for c, (basis, eye) in enumerate(cam_meta):
        base = c * width
        row = lambda k: rays_ref[k : k + 1, base : base + width].astype(dtype)
        px, py = row(0), row(1)
        gval, smask = row(2), row(3)

        # Screen-affine cascades (shared with the XLA path).
        if raster:
            if setups_ref is not None:
                # Per-env setup hoisted to batched XLA (_pack_setups):
                # the kernel reads packed (TILE_E, 1) coefficient columns
                # instead of burning ~300 one-lane VPU ops per box per
                # camera per tile (round-4 per-frame overhead fix).
                sbase = c * 2 * _SETUP_W
                scol_c = lambda j: setups_ref[:, sbase + j : sbase + j + 1]
                scol_p = (lambda j:
                          setups_ref[:, sbase + _SETUP_W + j
                                     : sbase + _SETUP_W + j + 1])
                su_c = _unpack_setup(scol_c)
                su_p = _unpack_setup(scol_p)
            else:
                su_c = _obb_q_setup(
                    basis, eye, cart_c, cart_q, scene.cart_half_extents,
                    LIGHT_DIR,
                )
                su_p = _obb_q_setup(
                    basis, eye, pole_c, pole_q, scene.pole_half_extents,
                    LIGHT_DIR,
                )
            b_c = b_p = None
            if mxu:
                # One MXU matmul emits all 18 ROUTED bound planes of both
                # boxes: every bound (a = w·inv_u; ub/lb = the per-env
                # near-plane routing of w·inv_l vs ±BIG) is affine in
                # (px, py, 1) with per-env coefficients — the routing
                # selects fold into the coefficients (scale on the screen
                # columns, ±BIG bias on the ones column).  The rays block
                # is the RHS verbatim (rows: px py gval smask 1 0 0 0 — the
                # gval/smask rows meet exact-zero coefficients).
                te = cart_c[0].shape[0]
                zc = jnp.zeros_like(cart_c[0])

                def lhs_row(b, c, a):
                    return jnp.concatenate([b, c, zc, zc, a, zc, zc, zc],
                                           axis=1)

                def bound_rows(su):
                    A3, B3, C3, iu, il, ahead, _, _ = su
                    fa = tuple(ahead[k].astype(dtype) for k in range(3))
                    rows = [
                        lhs_row(B3[k] * iu[k], C3[k] * iu[k], A3[k] * iu[k])
                        for k in range(3)
                    ]
                    for k in range(3):  # ub: ahead ? w·il : BIG
                        c1 = fa[k] * il[k]
                        rows.append(lhs_row(
                            B3[k] * c1, C3[k] * c1,
                            A3[k] * c1 + (1.0 - fa[k]) * _BIG,
                        ))
                    for k in range(3):  # lb: ahead ? -BIG : w·il
                        c2 = (1.0 - fa[k]) * il[k]
                        rows.append(lhs_row(
                            B3[k] * c2, C3[k] * c2, A3[k] * c2 - fa[k] * _BIG,
                        ))
                    return rows

                lhs = jnp.concatenate(
                    bound_rows(su_c) + bound_rows(su_p), axis=0
                )  # (18·TILE_E, 8)
                rhs = rays_ref[:, base : base + width].astype(dtype)
                W = jax.lax.dot_general(
                    lhs, rhs, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
                p9 = [W[i * te : (i + 1) * te] for i in range(18)]
                b_c = (tuple(p9[0:3]), tuple(p9[3:6]), tuple(p9[6:9]))
                b_p = (tuple(p9[9:12]), tuple(p9[12:15]), tuple(p9[15:18]))
            nc, lam_c, hit_c = _obb_q_cast(px, py, su_c, bounds=b_c)
            np_, lam_p, hit_p = _obb_q_cast(px, py, su_p, bounds=b_p)
        else:
            nc, dc, lam_c, hit_c = _ray_obb_affine(
                px, py, basis, eye, cart_c, cart_q, scene.cart_half_extents,
                LIGHT_DIR, recip_fn,
            )
            np_, dp, lam_p, hit_p = _ray_obb_affine(
                px, py, basis, eye, pole_c, pole_q, scene.pole_half_extents,
                LIGHT_DIR, recip_fn,
            )

        # Depth ordering between the boxes — float mask arithmetic.  Ground
        # occlusion tests are unnecessary: boxes sit above z=0, so a hit box
        # always occludes the ray's ground point (see _ray_obb_affine).
        if raster:  # inverse depth: larger is nearer, misses already −BIG
            order = (nc >= np_).astype(dtype)
        elif recip:
            order = (nc <= np_).astype(dtype)
        else:
            order = (nc * dp <= np_ * dc).astype(dtype)
        f_c = hit_c.astype(dtype) * order
        f_p = hit_p.astype(dtype) * (1.0 - f_c)
        lambert = jnp.maximum(f_c * lam_c + (1.0 - f_c) * lam_p, 0.0)
        shade = _AMBIENT + (1.0 - _AMBIENT) * lambert
        bgm = 1.0 - f_c - f_p  # masks are exclusive by construction

        a = f_c * shade
        b = f_p * shade
        g = bgm * gval
        s = bgm * smask

        if p2 > 1:
            def pool(f):
                acc = f[:, 0:stride]
                for i in range(1, p2):
                    acc = acc + f[:, i * stride : (i + 1) * stride]
                return acc * inv_p2

            a, b, g, s = pool(a), pool(b), pool(g), pool(s)

        for k in range(3):
            color = CART_COLOR[k] * a + POLE_COLOR[k] * b + g + SKY_COLOR[k] * s
            # Quantize IN f32 and floor to an exact integer — integers ≤256
            # are exact in bf16, so the uint8 narrowing outside the kernel
            # matches the XLA path's truncating cast bit-for-bit.
            color = jnp.floor(jnp.clip(color * 255.0 + 0.5, 0.0, 255.0))
            off = (c * 3 + k) * stride
            out_ref[:, off : off + stride] = color.astype(out_ref.dtype)


def make_render_repeats(
    config,
    cameras: tuple[Camera, ...] | None = None,
    dtype=jnp.uint8,
    tile_e: int = 32,
    interpret: bool = False,
    recip: bool = True,
    raster: bool = False,
    mxu: bool = False,
    hoist: bool = False,
):
    """Batched repeat renderer: (scene, poses (R, E, 16)) → obs (E, R, C·3·n).

    Renders every action-repeat's frame for every env in ONE ``pallas_call``
    (the per-frame variant launches ``action_repeats`` kernels per step and
    stacks frames XLA-side): grid (tiles_e, R), with repeat r's pooled
    planes written straight into lane block r of an (E, R·C·3·stride) slab —
    the obs stacking transpose never materializes.  ``poses`` come from
    physics.pallas_step.step_repeats_pallas.  Output matches
    ``jnp.stack([render(poses[r]) for r], axis=1)`` of
    :func:`make_render_batched` exactly.
    """
    cams = (cameras or DEFAULT_CAMERAS)[: config.num_cameras]
    h, w = config.render_height, config.render_width
    pool = getattr(config, "obs_pool", 1)
    rays, cam_meta, (p2, n, stride) = _build_ray_planes(
        cams, h, w, pool, getattr(config, "obs_samples", 0)
    )
    quantize = dtype == jnp.uint8
    kernel_dtype = jnp.bfloat16 if quantize else dtype
    frame_w = len(cams) * 3 * stride

    def render(scene: SceneParams, poses: jnp.ndarray) -> jnp.ndarray:
        r, e = poses.shape[0], poses.shape[1]
        if e % tile_e:
            raise ValueError(f"num envs {e} must be a multiple of {tile_e}")
        body = functools.partial(
            _render_kernel, scene, cam_meta, p2, stride, recip, raster, mxu
        )
        inputs = [poses, jnp.asarray(rays)]
        in_specs = [
            pl.BlockSpec((1, tile_e, 16), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, rays.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        if raster and hoist:
            # Per-env setup hoisted to batched XLA over all (R, E) at full
            # lane occupancy (see _pack_setups).  Byte-exact and census-
            # neutral — but the round-4b on-chip race measured it 23%
            # SLOWER (1cam exact 1.158M vs 1.504M): streaming the packed
            # setup columns HBM→VMEM costs more than recomputing ~300
            # element ops on one lane inside the kernel.  Compute is
            # cheaper than bandwidth; default OFF (--raster-hoist races).
            setups = _pack_setups(scene, cam_meta, poses)
            sw = setups.shape[-1]
            inputs.append(setups)
            in_specs.append(
                pl.BlockSpec((1, tile_e, sw), lambda i, j: (j, i, 0),
                             memory_space=pltpu.VMEM))
            kernel = lambda poses_ref, rays_ref, setups_ref, out_ref: body(
                poses_ref[0], rays_ref, out_ref, setups_ref=setups_ref[0]
            )
        else:
            kernel = lambda poses_ref, rays_ref, out_ref: body(
                poses_ref[0], rays_ref, out_ref
            )
        out = pl.pallas_call(
            kernel,
            grid=(e // tile_e, r),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (tile_e, frame_w), lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((e, r * frame_w), kernel_dtype),
            interpret=interpret,
        )(*inputs)
        # Drop per-plane lane padding → (E, R, C·3·n).
        planes = out.reshape(e, r * len(cams) * 3, stride)[:, :, :n]
        frames = planes.reshape(e, r, len(cams) * 3 * n)
        if quantize:
            return frames.astype(jnp.uint8)
        # Match the XLA float convention ([0,1]); see make_render_batched.
        return frames * jnp.asarray(1.0 / 255.0, frames.dtype)

    return render


def make_render_batched(
    config,
    cameras: tuple[Camera, ...] | None = None,
    dtype=jnp.uint8,
    tile_e: int = 32,
    interpret: bool = False,
    recip: bool = True,
    raster: bool = False,
    mxu: bool = False,
    hoist: bool = False,
):
    """Batched pallas renderer: (scene, rigid[E]) → flat frames
    (E, C·3·n) with n = pooled pixels per camera (config.obs_pool applied).

    Output layout and quantization match raycast.make_observe_pixels
    (plane-major per camera) so the two paths are interchangeable: uint8 is
    bit-matched; float dtypes return [0,1] colors like the XLA path but
    snapped to the kernel's 1/255 quantization grid (the kernel always
    rounds in f32 — see the epilogue comment).  E must be a multiple of
    ``tile_e``.
    """
    cams = (cameras or DEFAULT_CAMERAS)[: config.num_cameras]
    h, w = config.render_height, config.render_width
    pool = getattr(config, "obs_pool", 1)
    rays, cam_meta, (p2, n, stride) = _build_ray_planes(
        cams, h, w, pool, getattr(config, "obs_samples", 0)
    )
    quantize = dtype == jnp.uint8
    kernel_dtype = jnp.bfloat16 if quantize else dtype

    def render(scene: SceneParams, rigid: RigidState) -> jnp.ndarray:
        e = rigid.pos.shape[0]
        if e % tile_e != 0:
            raise ValueError(f"num envs {e} not a multiple of tile_e {tile_e}")
        poses = jnp.concatenate(
            [
                rigid.pos[:, 0], rigid.quat[:, 0],
                rigid.pos[:, 1], rigid.quat[:, 1],
                jnp.zeros((e, 2), rigid.pos.dtype),
            ],
            axis=-1,
        )  # (E, 16)
        body = functools.partial(
            _render_kernel, scene, cam_meta, p2, stride, recip, raster, mxu
        )
        kernel = body
        inputs = [poses, jnp.asarray(rays)]
        in_specs = [
            pl.BlockSpec((tile_e, 16), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, rays.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        if raster and hoist:
            setups = _pack_setups(scene, cam_meta, poses)
            inputs.append(setups)
            in_specs.append(
                pl.BlockSpec((tile_e, setups.shape[-1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM))
            # pallas_call passes refs positionally (inputs then outputs);
            # reorder into the kernel's (poses, rays, out, setups) slots.
            kernel = lambda poses_ref, rays_ref, setups_ref, out_ref: body(
                poses_ref, rays_ref, out_ref, setups_ref=setups_ref
            )
        out = pl.pallas_call(
            kernel,
            grid=(e // tile_e,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (tile_e, len(cams) * 3 * stride), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (e, len(cams) * 3 * stride), kernel_dtype
            ),
            interpret=interpret,
        )(*inputs)
        # Drop the per-plane lane padding → flat (E, C·3·n) frames.
        planes = out.reshape(e, len(cams) * 3, stride)[:, :, :n]
        frames = planes.reshape(e, len(cams) * 3 * n)
        if quantize:
            # Kernel already scaled+rounded to [0,255]; just narrow.
            return frames.astype(jnp.uint8)
        # Float request: rescale the kernel's [0,255] grid to the XLA
        # float convention ([0,1] colors) so the backends stay swappable.
        return frames * jnp.asarray(1.0 / 255.0, frames.dtype)

    return render
