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
kernel is ``pool²`` aligned lane-slice adds.  The static ray block also
carries the precomputed background (gray ground value + sky mask) and the
ground depth used for occlusion — rows [dx dy dz ox oy oz gval smask tg].

The cascade math is literally raycast._ray_obb_ratio — the same
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
from cartpoleplusplus_tpu.render.camera import DEFAULT_CAMERAS, Camera, ray_grid
from cartpoleplusplus_tpu.render.raycast import (
    CART_COLOR,
    GROUND_A,
    GROUND_B,
    LIGHT_DIR,
    POLE_COLOR,
    SKY_COLOR,
    _AMBIENT,
    _BIG,
    _ray_obb_ratio,
    pool_ray_layout,
)

LANE = 128
_ROWS = 16  # static per-ray rows, padded to a full sublane tile


def _build_ray_planes(cameras, h, w, pool: int = 1, samples: int = 0):
    """Static (16, cams·stride·p2) f32 block of per-ray constants.

    Rows: [dx dy dz ox oy oz ground_val sky_mask t_ground 0…].  Rays are in
    :func:`raycast.pool_ray_layout` order (pool-offset-major, tail-padded to
    128-aligned ``stride`` blocks) so in-kernel pooling is aligned slice
    adds; ``pool=1`` degenerates to one padded block per camera.  The
    background (checker ground × static Lambert, sky mask) and the ground
    depth depend only on the static rays, so they are baked here instead of
    recomputed per env tile.

    Returns (block, (p2, n, stride)) with n = pooled pixels per camera.
    """
    if pool > 1:
        sel, (p2, n, stride) = pool_ray_layout(pool, h, w, samples)
    else:
        n = h * w
        stride = -(-n // LANE) * LANE
        sel = np.concatenate([np.arange(n), np.full(stride - n, n - 1)])
        p2 = 1
    width = p2 * stride
    shade_g = _AMBIENT + (1.0 - _AMBIENT) * max(LIGHT_DIR[2], 0.0)

    cols = []
    for cam in cameras:
        dirs, eye = ray_grid(cam, h, w)
        d = dirs[sel]  # (width, 3)
        o = np.broadcast_to(eye, d.shape)
        with np.errstate(divide="ignore", invalid="ignore"):
            t_g = np.where(np.abs(d[:, 2]) > 1e-9, -eye[2] / d[:, 2], _BIG)
        t_g = np.where(t_g > 0.0, t_g, _BIG).astype(np.float32)
        gx = eye[0] + t_g * d[:, 0]
        gy = eye[1] + t_g * d[:, 1]
        checker = np.mod(np.floor(gx) + np.floor(gy), 2.0) > 0.5
        gvalid = t_g < _BIG * 0.5
        gval = np.where(
            gvalid, np.where(checker, GROUND_B[0], GROUND_A[0]) * shade_g, 0.0
        )
        smask = (~gvalid).astype(np.float32)
        rows = np.zeros((_ROWS, width), np.float32)
        rows[0:3] = d.T
        rows[3:6] = o.T
        rows[6] = gval
        rows[7] = smask
        rows[8] = t_g
        cols.append(rows)
    return np.concatenate(cols, axis=1), (p2, n, stride)


def _render_kernel(
    scene: SceneParams,
    num_cams: int,
    p2: int,
    stride: int,
    poses_ref,
    rays_ref,
    out_ref,
):
    """One env tile: cast + shade + pool all cameras' rays for TILE_E envs.

    Geometry runs in float32 (Mosaic rejects bf16 comparisons).  Color is
    produced through the 4-field decomposition of raycast._render_fields —
    cart/pole shade weights, background ground value, sky mask — as float
    MASK ARITHMETIC (Mosaic rejects selects whose operands are both scalar
    splats, so no jnp.where against constants).  Output: per camera, 3
    pooled color planes of ``stride`` lanes, quantized [0,255] but kept in
    the output dtype (uint8 stores are not universally supported).
    """
    dtype = jnp.float32
    width = p2 * stride
    # Every static plane is multiplied by a data-dependent 1.0 column so
    # Mosaic sees env-dependent (non-replicated) layouts throughout — its
    # replicated→tiled boolean relayouts are buggy (see round-1 notes).
    one_col = (poses_ref[:, 14:15] * 0.0 + 1.0).astype(dtype)  # (TILE_E, 1)
    col = lambda j: poses_ref[:, j : j + 1].astype(dtype)
    cart_c = (col(0), col(1), col(2))
    cart_q = (col(3), col(4), col(5), col(6))
    pole_c = (col(7), col(8), col(9))
    pole_q = (col(10), col(11), col(12), col(13))

    inv_p2 = 1.0 / p2
    for c in range(num_cams):
        base = c * width
        row = lambda k: rays_ref[k : k + 1, base : base + width].astype(dtype) * one_col
        d = (row(0), row(1), row(2))
        o = (row(3), row(4), row(5))
        gval, smask, t_g = row(6), row(7), row(8)

        # Division-free ratio cascades (shared with the XLA path).
        nc, dc, lam_c, hit_c = _ray_obb_ratio(
            o, d, cart_c, cart_q, scene.cart_half_extents, light=LIGHT_DIR
        )
        np_, dp, lam_p, hit_p = _ray_obb_ratio(
            o, d, pole_c, pole_q, scene.pole_half_extents, light=LIGHT_DIR
        )

        # Depth ordering vs ground/each other — float mask arithmetic.
        f_c = hit_c.astype(dtype) * (nc < t_g * dc).astype(dtype) * (
            nc * dp <= np_ * dc
        ).astype(dtype)
        f_p = (
            hit_p.astype(dtype)
            * (np_ < t_g * dp).astype(dtype)
            * (1.0 - f_c)
        )
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
    rays, (p2, n, stride) = _build_ray_planes(
        cams, h, w, pool, getattr(config, "obs_samples", 0)
    )
    quantize = dtype == jnp.uint8
    kernel_dtype = jnp.bfloat16 if quantize else dtype
    frame_w = len(cams) * 3 * stride

    def render(scene: SceneParams, poses: jnp.ndarray) -> jnp.ndarray:
        r, e = poses.shape[0], poses.shape[1]
        if e % tile_e:
            raise ValueError(f"num envs {e} must be a multiple of {tile_e}")
        body = functools.partial(_render_kernel, scene, len(cams), p2, stride)
        out = pl.pallas_call(
            lambda poses_ref, rays_ref, out_ref: body(
                poses_ref[0], rays_ref, out_ref
            ),
            grid=(e // tile_e, r),
            in_specs=[
                pl.BlockSpec((1, tile_e, 16), lambda i, j: (j, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_ROWS, rays.shape[1]), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tile_e, frame_w), lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((e, r * frame_w), kernel_dtype),
            interpret=interpret,
        )(poses, jnp.asarray(rays))
        # Drop per-plane lane padding → (E, R, C·3·n).
        planes = out.reshape(e, r * len(cams) * 3, stride)[:, :, :n]
        frames = planes.reshape(e, r, len(cams) * 3 * n)
        if quantize:
            return frames.astype(jnp.uint8)
        return frames

    return render


def make_render_batched(
    config,
    cameras: tuple[Camera, ...] | None = None,
    dtype=jnp.uint8,
    tile_e: int = 32,
    interpret: bool = False,
):
    """Batched pallas renderer: (scene, rigid[E]) → flat frames
    (E, C·3·n) with n = pooled pixels per camera (config.obs_pool applied).

    Output layout and quantization match raycast.make_observe_pixels with
    ``dtype=jnp.uint8`` (plane-major per camera) so the two paths are
    interchangeable.  E must be a multiple of ``tile_e``.
    """
    cams = (cameras or DEFAULT_CAMERAS)[: config.num_cameras]
    h, w = config.render_height, config.render_width
    pool = getattr(config, "obs_pool", 1)
    rays, (p2, n, stride) = _build_ray_planes(
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
        kernel = functools.partial(
            _render_kernel, scene, len(cams), p2, stride
        )
        out = pl.pallas_call(
            kernel,
            grid=(e // tile_e,),
            in_specs=[
                pl.BlockSpec((tile_e, 16), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_ROWS, rays.shape[1]), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tile_e, len(cams) * 3 * stride), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (e, len(cams) * 3 * stride), kernel_dtype
            ),
            interpret=interpret,
        )(poses, jnp.asarray(rays))
        # Drop the per-plane lane padding → flat (E, C·3·n) frames.
        planes = out.reshape(e, len(cams) * 3, stride)[:, :, :n]
        frames = planes.reshape(e, len(cams) * 3 * n)
        if quantize:
            # Kernel already scaled+rounded to [0,255]; just narrow.
            return frames.astype(jnp.uint8)
        return frames

    return render
