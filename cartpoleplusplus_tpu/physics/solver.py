"""Sequential-impulse (PGS) contact solver, branchless and batch-friendly.

Replaces Bullet's C++ ``btSequentialImpulseConstraintSolver`` (invoked inside
``p.stepSimulation``, reference bullet_cartpole.py:~L209-225).  Design notes
for TPU:

* The contact manifold has a *static* 16-slot layout (contacts.py), so the
  Gauss-Seidel sweep over slots is a compile-time-unrolled Python loop with
  static body indices — no gathers, no dynamic control flow.
* The iteration loop is a ``lax.fori_loop`` so the compiled graph stays small
  regardless of iteration count.
* Inactive slots participate with a 0 mask instead of being skipped — the
  branchless formulation is what makes 4096-way ``vmap`` free.
* Velocity-level Baumgarte stabilisation with slop, friction via a 2-tangent
  pyramid clamped by μ·λₙ, restitution 0 (Bullet's default).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cartpoleplusplus_tpu.physics import math3d
from cartpoleplusplus_tpu.physics.bodies import RigidState, SceneParams
from cartpoleplusplus_tpu.physics.contacts import BODY_A, BODY_B, N_CONTACTS, Contacts


def _world_inv_inertia(scene: SceneParams, state: RigidState) -> jnp.ndarray:
    """World-frame inverse inertia tensors, (2, 3, 3) = R diag(I⁻¹) Rᵀ."""
    rot = math3d.quat_to_mat(state.quat)  # (2, 3, 3)
    return jnp.einsum("bij,bj,bkj->bik", rot, scene.inv_inertia_body, rot)


def solve(
    scene: SceneParams, state: RigidState, contacts: Contacts
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run PGS on the velocity state; returns corrected (vel, ang).

    Unbatched (one env); vmap at the env layer.
    """
    dtype = state.vel.dtype
    inv_mass = scene.inv_mass
    inv_inertia = _world_inv_inertia(scene, state)  # (2,3,3)

    n = contacts.normal
    t1, t2 = math3d.make_tangent_basis(n)
    r_a, r_b = contacts.r_a, contacts.r_b
    active = contacts.active

    # Effective masses along normal and tangents, vectorised over all slots.
    # BODY_A / BODY_B are static tuples; numpy index arrays keep the gathers
    # host-side constants (scene.inv_mass is a numpy constant too).
    idx_a = np.asarray(BODY_A)
    idx_b = np.asarray([max(b, 0) for b in BODY_B])
    mask_b = np.asarray([1.0 if b >= 0 else 0.0 for b in BODY_B], dtype)
    invm_a, invm_b = inv_mass[idx_a], inv_mass[idx_b]
    inertia_a, inertia_b = inv_inertia[idx_a], inv_inertia[idx_b]

    def eff_inv_mass(direction):
        def ang_term(inertia, r):
            rxd = jnp.cross(r, direction)
            return jnp.sum(
                direction * jnp.cross(jnp.einsum("cij,cj->ci", inertia, rxd), r),
                axis=-1,
            )

        k = (
            invm_a
            + ang_term(inertia_a, r_a)
            + mask_b * (invm_b + ang_term(inertia_b, r_b))
        )
        return 1.0 / k

    inv_kn = eff_inv_mass(n)
    inv_kt1 = eff_inv_mass(t1)
    inv_kt2 = eff_inv_mass(t2)

    # Baumgarte velocity bias: drive penetrating contacts apart.
    bias = (scene.baumgarte / scene.dt) * jnp.maximum(
        contacts.penetration - scene.slop, 0.0
    )

    def rel_vel(vel, ang, i):
        a, b = BODY_A[i], BODY_B[i]
        v = vel[a] + jnp.cross(ang[a], r_a[i])
        if b >= 0:
            v = v - vel[b] - jnp.cross(ang[b], r_b[i])
        return v

    def apply_impulse(vel, ang, i, imp):
        a, b = BODY_A[i], BODY_B[i]
        vel = vel.at[a].add(inv_mass[a] * imp)
        ang = ang.at[a].add(inv_inertia[a] @ jnp.cross(r_a[i], imp))
        if b >= 0:
            vel = vel.at[b].add(-inv_mass[b] * imp)
            ang = ang.at[b].add(-(inv_inertia[b] @ jnp.cross(r_b[i], imp)))
        return vel, ang

    def iteration(_, carry):
        vel, ang, jn, jt1, jt2 = carry
        for i in range(N_CONTACTS):
            # Normal impulse with accumulated clamping at 0.
            vn = jnp.dot(rel_vel(vel, ang, i), n[i])
            dj = (bias[i] - vn) * inv_kn[i] * active[i]
            jn_new = jnp.maximum(jn[i] + dj, 0.0)
            d = jn_new - jn[i]
            jn = jn.at[i].set(jn_new)
            vel, ang = apply_impulse(vel, ang, i, d * n[i])

            # Friction along both tangents, clamped by the friction cone.
            bound = contacts.mu[i] * jn[i]
            vt1 = jnp.dot(rel_vel(vel, ang, i), t1[i])
            jt1_new = jnp.clip(jt1[i] - vt1 * inv_kt1[i] * active[i], -bound, bound)
            d1 = jt1_new - jt1[i]
            jt1 = jt1.at[i].set(jt1_new)
            vel, ang = apply_impulse(vel, ang, i, d1 * t1[i])

            vt2 = jnp.dot(rel_vel(vel, ang, i), t2[i])
            jt2_new = jnp.clip(jt2[i] - vt2 * inv_kt2[i] * active[i], -bound, bound)
            d2 = jt2_new - jt2[i]
            jt2 = jt2.at[i].set(jt2_new)
            vel, ang = apply_impulse(vel, ang, i, d2 * t2[i])
        return vel, ang, jn, jt1, jt2

    zeros = jnp.zeros((N_CONTACTS,), dtype)
    vel, ang, _, _, _ = jax.lax.fori_loop(
        0,
        scene.solver_iterations,
        iteration,
        (state.vel, state.ang, zeros, zeros, zeros),
    )
    return vel, ang
