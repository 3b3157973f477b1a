"""Pallas TPU kernel: batched camera rendering of the cartpole++ scene.

The hand-tiled version of render/raycast.py — replaces Bullet's TinyRenderer
(`p.getCameraImage`, reference bullet_cartpole.py:~L120-150) on the TPU hot
path.  One `pallas_call` renders every camera for a tile of envs entirely in
VMEM:

  * grid over env tiles; per step, a (TILE_E, 16) pose block (cart/pole
    pos+quat) and the static (8, P_pad) ray-direction/origin planes sit in
    VMEM;
  * per-env pose scalars are (TILE_E, 1) columns broadcasting against
    (1, P_pad) ray components → every op is a full-width (TILE_E, P_pad) VPU
    op in bfloat16;
  * the full shading pipeline (ground checker, two OBB slab tests, nearest
    hit, Lambert) runs with zero HBM round-trips; only the final RGB planes
    (TILE_E, 3·P_pad) leave the kernel.

The math reuses physics/soa.py's component-tuple algebra — the same
functions trace both XLA and Mosaic.  Equivalence with the XLA renderer is
pinned by tests/test_pallas_render.py (interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cartpoleplusplus_tpu.physics import soa
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
)

LANE = 128


def _pad_to(x: np.ndarray, n: int) -> np.ndarray:
    return np.pad(x, (0, n - x.shape[0]))


def _build_ray_planes(cameras, h, w):
    """Static (8, P_pad) f32 array: rows = [dx dy dz ox oy oz pad pad].

    All cameras' rays are concatenated along the pixel axis; per-pixel
    origins make multi-camera a pure data change.  P_pad is 128-aligned.
    """
    dirs_list, origin_list = [], []
    for cam in cameras:
        dirs, eye = ray_grid(cam, h, w)
        dirs_list.append(dirs)
        origin_list.append(np.broadcast_to(eye, dirs.shape))
    dirs = np.concatenate(dirs_list)  # (P, 3)
    orig = np.concatenate(origin_list)
    p = dirs.shape[0]
    p_pad = ((p + LANE - 1) // LANE) * LANE
    rows = [
        _pad_to(dirs[:, 0], p_pad), _pad_to(dirs[:, 1], p_pad),
        _pad_to(dirs[:, 2], p_pad),
        _pad_to(orig[:, 0], p_pad), _pad_to(orig[:, 1], p_pad),
        _pad_to(orig[:, 2], p_pad),
        np.zeros(p_pad, np.float32), np.zeros(p_pad, np.float32),
    ]
    return np.stack(rows).astype(np.float32), p, p_pad


def _ray_box_soa(origin_l, dir_l, he):
    """Slab test in component form (same math as raycast._ray_box)."""
    t_lo, t_hi = [], []
    for k in range(3):
        inv = jnp.where(jnp.abs(dir_l[k]) > 1e-6, 1.0 / dir_l[k], _BIG)
        a = (-float(he[k]) - origin_l[k]) * inv
        b = (float(he[k]) - origin_l[k]) * inv
        t_lo.append(jnp.minimum(a, b))
        t_hi.append(jnp.maximum(a, b))
    tmin = jnp.maximum(jnp.maximum(t_lo[0], t_lo[1]), t_lo[2])
    tmax = jnp.minimum(jnp.minimum(t_hi[0], t_hi[1]), t_hi[2])
    hit = (tmax >= tmin) & (tmax > 0.0)
    t_hit = jnp.where(hit & (tmin > 0.0), tmin, jnp.where(hit, tmax, _BIG))
    n = tuple(jnp.where(t_lo[k] == tmin, -jnp.sign(dir_l[k]), 0.0) for k in range(3))
    norm = jnp.sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2])
    inv = 1.0 / jnp.maximum(norm, 1e-6)
    return t_hit, (n[0] * inv, n[1] * inv, n[2] * inv), hit


def _render_kernel(scene: SceneParams, p_pad: int, poses_ref, rays_ref, out_ref):
    """One env tile: shade all cameras' rays for TILE_E envs.

    Geometry runs in float32 (the VPU has no bf16 comparisons — Mosaic
    rejects them with "Target does not support this comparison"); only the
    final color write narrows to the output dtype.
    """
    dtype = jnp.float32
    # Ray planes, broadcast to the full (TILE_E, P) tile up front.  The
    # broadcast multiplies by a data-dependent 1.0 (from the zero pad column
    # of the pose block): Mosaic tracks env-invariant values as sublane-
    # replicated layouts and then fails to relayout the boolean masks they
    # produce ("Invalid relayout … replicated in destination but not in
    # source"), so every plane must look env-dependent to the compiler.
    one_col = (poses_ref[:, 14:15] * 0.0 + 1.0).astype(dtype)  # (TILE_E, 1)
    d = tuple(rays_ref[k : k + 1, :].astype(dtype) * one_col for k in range(3))
    o = tuple(rays_ref[k : k + 1, :].astype(dtype) * one_col for k in range(3, 6))

    # Per-env pose columns: (TILE_E, 1).
    col = lambda j: poses_ref[:, j : j + 1].astype(dtype)
    cart_c = (col(0), col(1), col(2))
    cart_q = (col(3), col(4), col(5), col(6))
    pole_c = (col(7), col(8), col(9))
    pole_q = (col(10), col(11), col(12), col(13))

    dz = d[2]
    t_ground = jnp.where(jnp.abs(dz) > 1e-6, -o[2] / dz, _BIG)
    t_ground = jnp.where(t_ground > 0.0, t_ground, _BIG)
    gx = o[0] + t_ground * d[0]
    gy = o[1] + t_ground * d[1]
    # 0/1 float checker — Mosaic rejects selects whose operands are both
    # scalar splats (the predicate would need a fully-replicated layout), so
    # color mixing below is mask *arithmetic*, not jnp.where.
    checker = jnp.mod(jnp.floor(gx) + jnp.floor(gy), 2.0)

    def obb(center, quat, he):
        rel = (o[0] - center[0], o[1] - center[1], o[2] - center[2])
        origin_l = soa.q_rotate_inv(quat, rel)
        dir_l = soa.q_rotate_inv(quat, d)
        t, n_l, hit = _ray_box_soa(origin_l, dir_l, he)
        return t, soa.q_rotate(quat, n_l), hit

    t_cart, n_cart, _ = obb(cart_c, cart_q, scene.cart_half_extents)
    t_pole, n_pole, _ = obb(pole_c, pole_q, scene.pole_half_extents)

    t_near = jnp.minimum(t_ground, jnp.minimum(t_cart, t_pole))
    # 0/1 float masks, mutually exclusive by construction.
    sel_g = (t_near == t_ground).astype(dtype)
    sel_c = (t_near == t_cart).astype(dtype) * (1.0 - sel_g)
    sel_p = (t_near == t_pole).astype(dtype) * (1.0 - sel_g) * (1.0 - sel_c)
    miss = (t_near >= _BIG * 0.5).astype(dtype)

    normal = tuple(
        sel_g * gk + sel_c * ck + sel_p * pk
        for gk, ck, pk in zip((0.0, 0.0, 1.0), n_cart, n_pole)
    )
    lambert = jnp.maximum(
        normal[0] * LIGHT_DIR[0] + normal[1] * LIGHT_DIR[1] + normal[2] * LIGHT_DIR[2],
        0.0,
    )
    shade = _AMBIENT + (1.0 - _AMBIENT) * lambert

    for k in range(3):
        ground_k = GROUND_A[k] + checker * (GROUND_B[k] - GROUND_A[k])
        albedo = sel_g * ground_k + sel_c * CART_COLOR[k] + sel_p * POLE_COLOR[k]
        color = albedo * shade * (1.0 - miss) + miss * SKY_COLOR[k]
        out_ref[:, k * p_pad : (k + 1) * p_pad] = color.astype(out_ref.dtype)


def make_render_batched(
    config,
    cameras: tuple[Camera, ...] | None = None,
    dtype=jnp.bfloat16,
    tile_e: int = 32,
    interpret: bool = False,
):
    """Batched pallas renderer: (scene, rigid[E]) → flat frames (E, C·3·H·W).

    Output layout matches raycast.make_observe_pixels (plane-major per
    camera) so the two paths are interchangeable.  E must be a multiple of
    ``tile_e``.
    """
    cams = (cameras or DEFAULT_CAMERAS)[: config.num_cameras]
    h, w = config.render_height, config.render_width
    rays, p_total, p_pad = _build_ray_planes(cams, h, w)
    p_cam = h * w  # pixels per camera

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
        kernel = functools.partial(_render_kernel, scene, p_pad)
        out = pl.pallas_call(
            kernel,
            grid=(e // tile_e,),
            in_specs=[
                pl.BlockSpec((tile_e, 16), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, p_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_e, 3 * p_pad), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((e, 3 * p_pad), dtype),
            interpret=interpret,
        )(poses, jnp.asarray(rays))
        # (E, 3·P_pad) → plane-major flat frames (E, C·3·H·W), dropping pad.
        planes = out.reshape(e, 3, p_pad)[:, :, :p_total]  # (E, 3, C·H·W)
        planes = planes.reshape(e, 3, len(cams), p_cam)
        frames = jnp.swapaxes(planes, 1, 2)  # (E, C, 3, P)
        pool = getattr(config, "obs_pool", 1)
        if pool > 1:
            # Match raycast.make_observe_pixels' config.obs_pool epilogue so
            # the two render paths stay interchangeable (XLA-side pool; the
            # kernel itself still shades full-res).
            x = frames.reshape(e, len(cams), 3, h // pool, pool, w // pool, pool)
            frames = jnp.mean(x, axis=(4, 6))
            return frames.reshape(e, -1)
        return frames.reshape(e, len(cams) * 3 * p_cam)

    return render
