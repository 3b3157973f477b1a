"""Rigid-body stepping: semi-implicit Euler + contacts, fully jit/vmap-able.

This is the TPU-native replacement for Bullet's ``p.stepSimulation`` hot loop
(reference bullet_cartpole.py:~L207-225 calls it ``action_repeats ×
steps_per_repeat`` times per env step, each a Python→C FFI round-trip).  Here
the same substep cadence is a ``lax.scan`` inside one compiled program, so
stepping 4096 envs costs one kernel launch, not 4096×substeps FFI calls.

Pipeline per substep (matching Bullet's discrete-dynamics world order):
  1. integrate external forces into velocities (gravity + cart push),
  2. detect contacts at the current pose (contacts.py),
  3. resolve velocities with PGS impulses (solver.py),
  4. integrate positions/orientations with the corrected velocities.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cartpoleplusplus_tpu.physics import contacts as contacts_mod
from cartpoleplusplus_tpu.physics import math3d, solver
from cartpoleplusplus_tpu.physics.bodies import CART, RigidState, SceneParams


def substep(scene: SceneParams, state: RigidState, cart_force: jnp.ndarray) -> RigidState:
    """Advance one physics substep of ``scene.dt`` seconds (unbatched).

    ``cart_force``: (3,) world-frame force applied at the cart's COM — the
    analogue of the reference's ``p.applyExternalForce(cart, -1, (fx,fy,0),
    WORLD_FRAME)`` (bullet_cartpole.py:~L209-215).  Applied at the COM it
    produces no torque, exactly as upstream.
    """
    dt = scene.dt

    # 1. External forces → velocities (semi-implicit: forces first).
    vel = state.vel + dt * scene.gravity  # gravity on both bodies
    vel = vel.at[CART].add(dt * scene.inv_mass[CART] * cart_force)
    ang = state.ang

    # Bullet-style damping (defaults 0; kept for URDF parity).
    vel = vel * (1.0 - scene.linear_damping)
    ang = ang * (1.0 - scene.angular_damping)

    pre = RigidState(pos=state.pos, quat=state.quat, vel=vel, ang=ang)

    # 2-3. Contacts + impulse resolution.
    manifold = contacts_mod.generate(scene, pre)
    vel, ang = solver.solve(scene, pre, manifold)

    # 4. Integrate pose with corrected velocities.
    pos = state.pos + dt * vel
    quat = math3d.quat_integrate(state.quat, ang, dt)
    return RigidState(pos=pos, quat=quat, vel=vel, ang=ang)


def step_substeps(
    scene: SceneParams,
    state: RigidState,
    cart_force: jnp.ndarray,
    num_substeps: int,
) -> RigidState:
    """Run ``num_substeps`` substeps holding the applied force constant.

    Mirrors the reference's inner loop (bullet_cartpole.py:~L207-215):
    the same (fx, fy) force is re-applied before every ``stepSimulation``.
    """

    def body(s, _):
        return substep(scene, s, cart_force), None

    state, _ = jax.lax.scan(body, state, None, length=num_substeps)
    return state


def kinetic_energy(scene: SceneParams, state: RigidState) -> jnp.ndarray:
    """Total kinetic energy — used by conservation tests, not the hot path."""
    lin = 0.5 * jnp.sum(scene.mass[:, None] * state.vel**2)
    # Rotate ω into the body frame to use the diagonal inertia.
    w_body = math3d.quat_rotate_inv(state.quat, state.ang)
    rot = 0.5 * jnp.sum(w_body**2 / scene.inv_inertia_body)
    return lin + rot


def potential_energy(scene: SceneParams, state: RigidState) -> jnp.ndarray:
    """Gravitational potential energy (g is along -z)."""
    return jnp.sum(scene.mass * (-scene.gravity[2]) * state.pos[:, 2])
