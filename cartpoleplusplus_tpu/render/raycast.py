"""Branchless ray-cast renderer for the cartpole++ scene (pure XLA, SoA).

TPU-native replacement for Bullet's TinyRenderer software rasterizer behind
``p.getCameraImage`` (reference: bullet_cartpole.py:~L120-150; SURVEY.md §2.2
native-component table).  Rather than translating a triangle rasterizer, the
scene's tiny analytic geometry (2 oriented boxes + ground plane) makes
per-pixel ray casting the idiomatic TPU design: every pixel is independent
VPU work, there is no z-buffer ordering, and everything is `where`-masked.

Layout notes (the part that actually sets the speed): every vector quantity
is a COMPONENT TUPLE of (P,) pixel arrays — never a (P, 3) array.  TPU tiling
pads the trailing two dims of materialized arrays to (8, 128), so (P, 3)
intermediates run on 3 of 128 VPU lanes and cost ~40× the HBM traffic
(measured ~16 ms/frame at 4096 envs vs ~1 ms in component form).  For the
same reason a rendered frame is returned FLAT and plane-major:
``(3·P,)`` = [R plane | G plane | B plane] per camera, cameras concatenated.
Use ``frame_to_images`` for host-side viewing.

Shading: one directional light + ambient, Lambert on the hit normal, distinct
albedo per body (ground checker, blue cart, red pole), sky background.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cartpoleplusplus_tpu.physics import soa
from cartpoleplusplus_tpu.physics.bodies import CART, POLE, RigidState, SceneParams
from cartpoleplusplus_tpu.render.camera import DEFAULT_CAMERAS, Camera, ray_grid

_BIG = 1e9

# Albedos (RGB) — chosen for contrast; the reference's exact URDF colors are
# unrecoverable (empty mount).
GROUND_A = (0.82, 0.82, 0.82)
GROUND_B = (0.62, 0.62, 0.62)
CART_COLOR = (0.15, 0.35, 0.9)
POLE_COLOR = (0.9, 0.15, 0.15)
SKY_COLOR = (0.7, 0.85, 1.0)

_L = np.array([0.45, 0.3, 0.84])
_L = _L / np.linalg.norm(_L)
LIGHT_DIR = (float(_L[0]), float(_L[1]), float(_L[2]))
_AMBIENT = 0.35


def _ray_box(origin_l, dir_l, half_extents):
    """Slab-test ray vs axis-aligned box, component form.

    origin_l / dir_l: component tuples (arrays broadcastable to (P,));
    half_extents: (3,) python/numpy floats.  Returns (t_hit, normal_l tuple,
    hit mask); t_hit = _BIG where missed.  Branchless.
    """
    t_lo, t_hi = [], []
    for k in range(3):
        inv = jnp.where(jnp.abs(dir_l[k]) > 1e-9, 1.0 / dir_l[k], _BIG)
        a = (-float(half_extents[k]) - origin_l[k]) * inv
        b = (float(half_extents[k]) - origin_l[k]) * inv
        t_lo.append(jnp.minimum(a, b))
        t_hi.append(jnp.maximum(a, b))
    tmin = jnp.maximum(jnp.maximum(t_lo[0], t_lo[1]), t_lo[2])
    tmax = jnp.minimum(jnp.minimum(t_hi[0], t_hi[1]), t_hi[2])
    hit = (tmax >= tmin) & (tmax > 0.0)
    t_hit = jnp.where(hit & (tmin > 0.0), tmin, jnp.where(hit, tmax, _BIG))
    # Normal = axis of the slab that produced tmin, signed against the ray.
    n = tuple(
        jnp.where(t_lo[k] == tmin, -jnp.sign(dir_l[k]), 0.0) for k in range(3)
    )
    norm = jnp.sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2])
    inv = 1.0 / jnp.maximum(norm, 1e-9)
    return t_hit, (n[0] * inv, n[1] * inv, n[2] * inv), hit


def _ray_obb(origin, direction, center, quat, half_extents):
    """Ray vs oriented box: rotate into the box frame, slab-test.

    ``origin``/``center``: component tuples of scalars (per-env);
    ``direction``: component tuple of (P,) arrays; ``quat``: 4-tuple scalars.
    """
    rel = (origin[0] - center[0], origin[1] - center[1], origin[2] - center[2])
    origin_l = soa.q_rotate_inv(quat, rel)
    dir_l = soa.q_rotate_inv(quat, direction)
    t, normal_l, hit = _ray_box(origin_l, dir_l, half_extents)
    normal_w = soa.q_rotate(quat, normal_l)
    return t, normal_w, hit


def render_planes(
    scene: SceneParams,
    rigid: RigidState,
    dirs: tuple[np.ndarray, np.ndarray, np.ndarray],
    eye: tuple[float, float, float],
    dtype=jnp.float32,
):
    """Shade P rays → (r, g, b) component planes, each (P,) of ``dtype``.

    Unbatched over envs (vmap at the env layer keeps the pixel axis
    trailing).  ``dirs`` are static numpy component arrays; ``eye`` static
    floats — both bake into the compiled program.

    ``dtype=jnp.bfloat16`` halves the renderer's HBM traffic; an 8-bit
    mantissa is ~0.4% relative error — sub-pixel at 50×50 and far below the
    uint8 quantization the replay buffer applies anyway.
    """
    dx, dy, dz = (jnp.asarray(d, dtype) for d in dirs)
    d = (dx, dy, dz)
    e = (float(eye[0]), float(eye[1]), float(eye[2]))

    # Ground plane z=0 with checkerboard.
    t_ground = jnp.where(jnp.abs(dz) > 1e-9, -e[2] / dz, _BIG)
    t_ground = jnp.where(t_ground > 0.0, t_ground, _BIG)
    gx = e[0] + t_ground * dx
    gy = e[1] + t_ground * dy
    checker = jnp.mod(jnp.floor(gx) + jnp.floor(gy), 2.0) > 0.5

    # Cart and pole boxes (per-env scalars from the rigid state).
    cart_c = tuple(rigid.pos[CART, k].astype(dtype) for k in range(3))
    pole_c = tuple(rigid.pos[POLE, k].astype(dtype) for k in range(3))
    cart_q = tuple(rigid.quat[CART, k].astype(dtype) for k in range(4))
    pole_q = tuple(rigid.quat[POLE, k].astype(dtype) for k in range(4))
    t_cart, n_cart, _ = _ray_obb(e, d, cart_c, cart_q, scene.cart_half_extents)
    t_pole, n_pole, _ = _ray_obb(e, d, pole_c, pole_q, scene.pole_half_extents)

    t_near = jnp.minimum(t_ground, jnp.minimum(t_cart, t_pole))
    sel_g = t_near == t_ground
    sel_c = (t_near == t_cart) & ~sel_g
    sel_p = (t_near == t_pole) & ~sel_g & ~sel_c
    miss = t_near >= _BIG * 0.5

    # Lambert on the selected normal.
    def sel3(gv, cv, pv):
        return (
            jnp.where(sel_g, gv[0], 0.0) + jnp.where(sel_c, cv[0], 0.0) + jnp.where(sel_p, pv[0], 0.0),
            jnp.where(sel_g, gv[1], 0.0) + jnp.where(sel_c, cv[1], 0.0) + jnp.where(sel_p, pv[1], 0.0),
            jnp.where(sel_g, gv[2], 0.0) + jnp.where(sel_c, cv[2], 0.0) + jnp.where(sel_p, pv[2], 0.0),
        )

    zero = jnp.zeros_like(dx)
    one = jnp.ones_like(dx)
    normal = sel3((zero, zero, one), n_cart, n_pole)
    lambert = jnp.maximum(
        normal[0] * LIGHT_DIR[0] + normal[1] * LIGHT_DIR[1] + normal[2] * LIGHT_DIR[2],
        0.0,
    )
    shade = _AMBIENT + (1.0 - _AMBIENT) * lambert

    planes = []
    for k in range(3):
        ground_k = jnp.where(checker, GROUND_B[k], GROUND_A[k])
        albedo = (
            jnp.where(sel_g, ground_k, 0.0)
            + jnp.where(sel_c, CART_COLOR[k], 0.0)
            + jnp.where(sel_p, POLE_COLOR[k], 0.0)
        )
        planes.append(jnp.where(miss, SKY_COLOR[k], albedo * shade))
    return tuple(planes)


def render_rays(
    scene: SceneParams, rigid: RigidState, origin: jnp.ndarray, dirs: jnp.ndarray
) -> jnp.ndarray:
    """Compatibility/testing surface: (N, 3) rays → (N, 3) RGB.

    Off the hot path (tests, host-side probes).  The fused loop uses
    ``render_planes`` through ``make_observe_pixels``.
    """
    o = np.asarray(origin, np.float32)
    d = np.asarray(dirs, np.float32)
    r, g, b = render_planes(
        scene, rigid, (d[:, 0], d[:, 1], d[:, 2]), (o[0], o[1], o[2])
    )
    return jnp.stack([r, g, b], axis=-1)


def make_observe_pixels(
    config,
    cameras: tuple[Camera, ...] | None = None,
    dtype=jnp.bfloat16,
):
    """Build an ObserveFn: (scene, rigid) → FLAT (num_cameras·3·H·W,) frame.

    Drop-in for env.cartpole's observe_fn hook — the pixel analogue of
    ``observe_lowdim`` (reference --use-raw-pixels state assembly,
    bullet_cartpole.py:~L120-150).  Frame layout is plane-major per camera:
    [cam0 R | cam0 G | cam0 B | cam1 R | …], row-major pixels within a plane
    (see module docstring for why).
    """
    cams = (cameras or DEFAULT_CAMERAS)[: config.num_cameras]
    h, w = config.render_height, config.render_width
    grids = []
    for c in cams:
        dirs, eye = ray_grid(c, h, w)
        grids.append(((dirs[:, 0], dirs[:, 1], dirs[:, 2]), tuple(eye)))

    def observe(scene: SceneParams, rigid: RigidState) -> jnp.ndarray:
        planes = []
        for dirs, eye in grids:
            planes.extend(render_planes(scene, rigid, dirs, eye, dtype=dtype))
        return jnp.concatenate(planes) if len(planes) > 1 else planes[0]

    return observe


def frame_to_images(config, frame) -> np.ndarray:
    """Host-side: flat plane-major frame(s) (…, C·3·H·W) → (…, C, H, W, 3)."""
    h, w, c = config.render_height, config.render_width, config.num_cameras
    arr = np.asarray(frame)
    planes = arr.reshape(arr.shape[:-1] + (c, 3, h, w))
    return np.moveaxis(planes, -3, -1)
