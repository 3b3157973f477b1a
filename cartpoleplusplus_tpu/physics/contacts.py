"""Analytic contact generation for the cartpole++ scene.

The reference relies on Bullet's general broadphase + narrowphase collision
pipeline (C++, invoked per substep via ``p.stepSimulation``,
bullet_cartpole.py:~L209-225).  The scene only ever contains three bodies with
three possible contact pairs, so the TPU rebuild replaces the general pipeline
with a *static* contact manifold: a fixed list of 16 candidate contact points
whose activity is decided by branchless ``where`` masks.  Static layout means
zero dynamic shapes, perfect ``vmap``-ability over thousands of envs, and
static body indices in the solver.

Contact slots:
  [0:4)   cart bottom corners  vs ground plane
  [4:12)  pole corners (all 8) vs ground plane
  [12:16) pole bottom corners  vs cart top face

Known approximation: pole↔cart side-face contact is not modelled (once the
pole tips past the cart edge it free-falls to the ground, matching the
reference's qualitative behaviour where an episode has long since terminated
on tilt angle by then).
"""

from __future__ import annotations

import itertools

import jax.numpy as jnp
from flax import struct

from cartpoleplusplus_tpu.physics import math3d
from cartpoleplusplus_tpu.physics.bodies import CART, POLE, RigidState, SceneParams

# Static per-slot body indices: body_a receives +impulse along the normal,
# body_b (or the static ground, -1) receives the reaction.
BODY_A = (CART,) * 4 + (POLE,) * 8 + (POLE,) * 4
BODY_B = (-1,) * 4 + (-1,) * 8 + (CART,) * 4
N_CONTACTS = len(BODY_A)

# Corner sign patterns.
_BOTTOM4 = tuple(itertools.product((-1.0, 1.0), (-1.0, 1.0), (-1.0,)))
_ALL8 = tuple(itertools.product((-1.0, 1.0), (-1.0, 1.0), (-1.0, 1.0)))

# Pole corners can penetrate the cart top at most this fraction of the cart's
# half-height before the slot deactivates (treat deeper overlap as "pole is
# beside the cart", since side faces are not modelled).
_TOP_FACE_BAND = 0.5


@struct.dataclass
class Contacts:
    """Per-slot contact geometry for one env (batch via vmap)."""

    normal: jnp.ndarray  # (16, 3) world, points from b (or ground) into a
    r_a: jnp.ndarray  # (16, 3) contact point relative to body_a COM
    r_b: jnp.ndarray  # (16, 3) relative to body_b COM (zeros for ground)
    penetration: jnp.ndarray  # (16,) >= 0 where active
    active: jnp.ndarray  # (16,) float 0/1 mask
    mu: jnp.ndarray  # (16,) friction coefficient per slot


def _corner_offsets(half_extents: jnp.ndarray, signs) -> jnp.ndarray:
    return jnp.asarray(signs, half_extents.dtype) * half_extents


def generate(scene: SceneParams, state: RigidState) -> Contacts:
    """Contact manifold at the current (unbatched) pose."""
    dtype = state.pos.dtype
    cart_pos, pole_pos = state.pos[CART], state.pos[POLE]
    cart_quat, pole_quat = state.quat[CART], state.quat[POLE]

    up = jnp.array([0.0, 0.0, 1.0], dtype)

    # --- cart corners vs ground -------------------------------------------
    cart_corners_local = _corner_offsets(scene.cart_half_extents, _BOTTOM4)  # (4,3)
    cart_corners_world = cart_pos + math3d.quat_rotate(
        cart_quat[None, :], cart_corners_local
    )
    cart_pen = -cart_corners_world[:, 2]
    cart_active = (cart_pen > 0.0).astype(dtype)
    cart_normal = jnp.broadcast_to(up, (4, 3))
    cart_r_a = cart_corners_world - cart_pos
    cart_r_b = jnp.zeros((4, 3), dtype)
    cart_mu = jnp.full((4,), 1.0, dtype) * scene.friction_cart_ground

    # --- pole corners vs ground -------------------------------------------
    pole_corners_local = _corner_offsets(scene.pole_half_extents, _ALL8)  # (8,3)
    pole_corners_world = pole_pos + math3d.quat_rotate(
        pole_quat[None, :], pole_corners_local
    )
    pg_pen = -pole_corners_world[:, 2]
    pg_active = (pg_pen > 0.0).astype(dtype)
    pg_normal = jnp.broadcast_to(up, (8, 3))
    pg_r_a = pole_corners_world - pole_pos
    pg_r_b = jnp.zeros((8, 3), dtype)
    pg_mu = jnp.full((8,), 1.0, dtype) * scene.friction_pole_ground

    # --- pole bottom corners vs cart top face -----------------------------
    pole_bottom_local = _corner_offsets(scene.pole_half_extents, _BOTTOM4)
    pole_bottom_world = pole_pos + math3d.quat_rotate(
        pole_quat[None, :], pole_bottom_local
    )
    # Express the corners in the cart's frame; the top face is z = +hz there.
    in_cart = math3d.quat_rotate_inv(
        cart_quat[None, :], pole_bottom_world - cart_pos
    )
    hx, hy, hz = (
        scene.cart_half_extents[0],
        scene.cart_half_extents[1],
        scene.cart_half_extents[2],
    )
    pc_pen = hz - in_cart[:, 2]
    # Small footprint margin keeps the resting pole from chattering off the
    # face under float32 jitter.
    margin = jnp.asarray(1e-3, dtype)
    inside = (
        (jnp.abs(in_cart[:, 0]) <= hx + margin)
        & (jnp.abs(in_cart[:, 1]) <= hy + margin)
        & (pc_pen > 0.0)
        & (pc_pen < _TOP_FACE_BAND * hz)
    )
    pc_active = inside.astype(dtype)
    pc_normal = jnp.broadcast_to(
        math3d.quat_rotate(cart_quat, up), (4, 3)
    )  # cart top-face normal in world frame
    pc_r_a = pole_bottom_world - pole_pos
    pc_r_b = pole_bottom_world - cart_pos
    pc_mu = jnp.full((4,), 1.0, dtype) * scene.friction_pole_cart

    return Contacts(
        normal=jnp.concatenate([cart_normal, pg_normal, pc_normal]),
        r_a=jnp.concatenate([cart_r_a, pg_r_a, pc_r_a]),
        r_b=jnp.concatenate([cart_r_b, pg_r_b, pc_r_b]),
        penetration=jnp.concatenate([cart_pen, pg_pen, pc_pen]),
        active=jnp.concatenate([cart_active, pg_active, pc_active]),
        mu=jnp.concatenate([cart_mu, pg_mu, pc_mu]),
    )
