"""Branchless ray-cast renderer for the cartpole++ scene (pure XLA).

TPU-native replacement for Bullet's TinyRenderer software rasterizer behind
``p.getCameraImage`` (reference: bullet_cartpole.py:~L120-150; SURVEY.md §2.2
native-component table).  Rather than translating a triangle rasterizer, the
scene's tiny analytic geometry (2 oriented boxes + ground plane) makes
per-pixel ray casting the idiomatic TPU design: every pixel is independent
VPU work, there is no z-buffer ordering, and everything is `where`-masked —
so the whole image is one fused elementwise program that `vmap`s over
thousands of envs.  render/pallas.py carries the hand-tiled kernel version of
the same math; this module is the reference implementation and CPU path.

Shading: one directional light + ambient, Lambert on the hit normal, distinct
albedo per body (ground checker, blue cart, red pole), sky background.
Output float32 RGB in [0, 1], shape (H, W, 3).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cartpoleplusplus_tpu.physics import math3d
from cartpoleplusplus_tpu.physics.bodies import CART, POLE, RigidState, SceneParams
from cartpoleplusplus_tpu.render.camera import DEFAULT_CAMERAS, Camera, ray_grid

_BIG = 1e9

# Albedos (RGB) — chosen for contrast; the reference's exact URDF colors are
# unrecoverable (empty mount).
GROUND_A = np.array([0.82, 0.82, 0.82], np.float32)
GROUND_B = np.array([0.62, 0.62, 0.62], np.float32)
CART_COLOR = np.array([0.15, 0.35, 0.9], np.float32)
POLE_COLOR = np.array([0.9, 0.15, 0.15], np.float32)
SKY_COLOR = np.array([0.7, 0.85, 1.0], np.float32)

_LIGHT_DIR = np.array([0.45, 0.3, 0.84], np.float32)
_LIGHT_DIR = _LIGHT_DIR / np.linalg.norm(_LIGHT_DIR)
_AMBIENT = 0.35


def _ray_box(origin_l, dir_l, half_extents):
    """Slab-test ray vs axis-aligned box in the box's local frame.

    origin_l/dir_l: (..., 3) local-frame ray; half_extents: (3,).
    Returns (t_hit, normal_l, hit_mask); t_hit = _BIG where missed.
    Fully branchless: degenerate (axis-parallel) components get huge slabs.
    """
    inv = jnp.where(jnp.abs(dir_l) > 1e-9, 1.0 / dir_l, _BIG)
    t1 = (-half_extents - origin_l) * inv
    t2 = (half_extents - origin_l) * inv
    tmin_ax = jnp.minimum(t1, t2)  # (..., 3)
    tmax_ax = jnp.maximum(t1, t2)
    tmin = jnp.max(tmin_ax, axis=-1)
    tmax = jnp.min(tmax_ax, axis=-1)
    hit = (tmax >= tmin) & (tmax > 0.0)
    t_hit = jnp.where(hit & (tmin > 0.0), tmin, jnp.where(hit, tmax, _BIG))
    # Normal = axis of the slab that produced tmin, signed by ray direction.
    is_entry_ax = (tmin_ax == tmin[..., None]).astype(dir_l.dtype)
    normal_l = -jnp.sign(dir_l) * is_entry_ax
    nrm = jnp.linalg.norm(normal_l, axis=-1, keepdims=True)
    normal_l = normal_l / jnp.maximum(nrm, 1e-9)
    return t_hit, normal_l, hit


def _ray_obb(origin, direction, center, quat, half_extents):
    """Ray vs oriented box: rotate the ray into the box frame, slab-test."""
    origin_l = math3d.quat_rotate_inv(quat, origin - center)
    dir_l = math3d.quat_rotate_inv(quat, direction)
    t, normal_l, hit = _ray_box(origin_l, dir_l, half_extents)
    normal_w = math3d.quat_rotate(quat, normal_l)
    return t, normal_w, hit


def render_rays(
    scene: SceneParams, rigid: RigidState, origins: jnp.ndarray, dirs: jnp.ndarray
) -> jnp.ndarray:
    """Shade N rays against the current scene state → (N, 3) RGB.

    ``origins``: (3,) shared eye or (N, 3); ``dirs``: (N, 3).
    Unbatched over envs — vmap at the env layer.
    """
    origins = jnp.broadcast_to(origins, dirs.shape)

    # Ground plane z=0.
    dz = dirs[..., 2]
    t_ground = jnp.where(jnp.abs(dz) > 1e-9, -origins[..., 2] / dz, _BIG)
    t_ground = jnp.where(t_ground > 0.0, t_ground, _BIG)
    gx = origins[..., 0] + t_ground * dirs[..., 0]
    gy = origins[..., 1] + t_ground * dirs[..., 1]
    checker = jnp.mod(jnp.floor(gx) + jnp.floor(gy), 2.0)
    ground_color = jnp.where(
        checker[..., None] > 0.5, GROUND_B[None, :], GROUND_A[None, :]
    )
    ground_normal = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], dirs.dtype), dirs.shape
    )

    # Cart and pole boxes.
    t_cart, n_cart, _ = _ray_obb(
        origins, dirs, rigid.pos[CART], rigid.quat[CART], scene.cart_half_extents
    )
    t_pole, n_pole, _ = _ray_obb(
        origins, dirs, rigid.pos[POLE], rigid.quat[POLE], scene.pole_half_extents
    )

    # Nearest-hit resolution, fully where-masked.
    ts = jnp.stack([t_ground, t_cart, t_pole], axis=-1)  # (N, 3)
    t_near = jnp.min(ts, axis=-1)
    sel_ground = (t_near == t_ground)[..., None]
    sel_cart = (t_near == t_cart)[..., None] & ~sel_ground
    sel_pole = (t_near == t_pole)[..., None] & ~sel_ground & ~sel_cart
    miss = (t_near >= _BIG * 0.5)[..., None]

    albedo = (
        jnp.where(sel_ground, ground_color, 0.0)
        + jnp.where(sel_cart, CART_COLOR[None, :], 0.0)
        + jnp.where(sel_pole, POLE_COLOR[None, :], 0.0)
    )
    normal = (
        jnp.where(sel_ground, ground_normal, 0.0)
        + jnp.where(sel_cart, n_cart, 0.0)
        + jnp.where(sel_pole, n_pole, 0.0)
    )

    lambert = jnp.maximum(
        jnp.sum(normal * jnp.asarray(_LIGHT_DIR, dirs.dtype), axis=-1), 0.0
    )
    shade = _AMBIENT + (1.0 - _AMBIENT) * lambert
    color = albedo * shade[..., None]
    return jnp.where(miss, jnp.asarray(SKY_COLOR, dirs.dtype)[None, :], color)


def make_observe_pixels(
    config,
    cameras: tuple[Camera, ...] | None = None,
):
    """Build an ObserveFn: (scene, rigid) → (num_cameras, H, W, 3) frame.

    Drop-in for env.cartpole's observe_fn hook — the pixel analogue of
    ``observe_lowdim`` (reference --use-raw-pixels state assembly,
    bullet_cartpole.py:~L120-150).  Ray grids are host-side constants baked
    into the jitted step.
    """
    cams = (cameras or DEFAULT_CAMERAS)[: config.num_cameras]
    h, w = config.render_height, config.render_width
    grids = [ray_grid(c, h, w) for c in cams]

    def observe(scene: SceneParams, rigid: RigidState) -> jnp.ndarray:
        frames = []
        for dirs, eye in grids:
            rgb = render_rays(scene, rigid, jnp.asarray(eye), jnp.asarray(dirs))
            frames.append(rgb.reshape(h, w, 3))
        return jnp.stack(frames)

    return observe
