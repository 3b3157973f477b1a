"""Contact solver: mass-splitting Jacobi impulses, all slots in parallel.

Replaces Bullet's C++ ``btSequentialImpulseConstraintSolver`` (invoked inside
``p.stepSimulation``, reference bullet_cartpole.py:~L209-225).  Design notes
for TPU:

* A Gauss-Seidel sweep (Bullet's choice, and this module's first version) is
  a *sequential* chain of ~16 slots × ~15 tiny ops per iteration — dependency
  depth, not FLOPs, dominates on TPU.  This solver instead updates ALL 16
  contact slots simultaneously each iteration (Jacobi), with **mass
  splitting**: each body's inverse mass/inertia is scaled by its number of
  active contacts when computing per-contact impulses, which makes the
  simultaneous update provably non-overshooting (each contact pushes a
  virtual sub-body of mass m/n; merging sub-bodies averages velocities).
  Accuracy per iteration is lower than Gauss-Seidel, so more iterations are
  needed per unit of accuracy; the validated default is
  ``bodies.SceneParams.solver_iterations = 3`` (round 4: passes the analytic
  tests in tests/test_physics.py, the MuJoCo cross-checks in
  tests/test_fidelity_external.py, and the tests/test_solver_iters.py
  arbiters — topple time identical to 5 iterations at the 12.5 ms
  granularity, settle rest position 3.9 mm vs a 30-iteration reference
  against an 80 mm MuJoCo-agreement bound — and the full-scale DDPG recipe
  solves at 194/200, runs/ddpg_it3_s0.jsonl; measured 18.4M vs 15.5M
  low-dim steps/s, BASELINE.md round 4).  5 was the round-2/3 conservative
  setting (tracks the 30-iteration reference to ~2 mm over a 1 s
  topple+push trajectory) — either is still ~10× shallower end-to-end than
  a 16-slot sequential sweep.
  Bullet-style impulse warm starting across substeps was implemented and
  MEASURED WORSE: cold solves already converge in ~4 iterations on this
  2-body manifold, and carrying impulses shifted the transient (warm@4
  deviated 30× further from the converged reference than cold@4), so the
  extra state and per-substep apply cost bought nothing.
* All per-slot math is vectorized over the static 16-slot manifold
  (contacts.py); impulses scatter back to the 2 bodies through constant
  (2, 16) incidence matrices — a tiny matmul instead of 16 ``.at[].add``s.
* Inactive slots participate with a 0 mask instead of being skipped; the
  branchless formulation is what makes 4096-way ``vmap`` free.
* Velocity-level Baumgarte stabilisation with slop, friction via a 2-tangent
  pyramid clamped by μ·λₙ, restitution 0 (Bullet's default).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cartpoleplusplus_tpu.physics import math3d
from cartpoleplusplus_tpu.physics.bodies import NUM_BODIES, RigidState, SceneParams
from cartpoleplusplus_tpu.physics.contacts import BODY_A, BODY_B, N_CONTACTS, Contacts

# Static incidence: INC_A[b, c] = 1 iff slot c's body_a is b (same for B).
_IDX_A = np.asarray(BODY_A)
_IDX_B = np.asarray([max(b, 0) for b in BODY_B])
_MASK_B = np.asarray([1.0 if b >= 0 else 0.0 for b in BODY_B], np.float32)
INC_A = np.zeros((NUM_BODIES, N_CONTACTS), np.float32)
INC_A[_IDX_A, np.arange(N_CONTACTS)] = 1.0
INC_B = np.zeros((NUM_BODIES, N_CONTACTS), np.float32)
INC_B[_IDX_B, np.arange(N_CONTACTS)] = _MASK_B


def _world_inv_inertia(scene: SceneParams, state: RigidState) -> jnp.ndarray:
    """World-frame inverse inertia tensors, (2, 3, 3) = R diag(I⁻¹) Rᵀ."""
    rot = math3d.quat_to_mat(state.quat)  # (2, 3, 3)
    return jnp.einsum("bij,bj,bkj->bik", rot, jnp.asarray(scene.inv_inertia_body), rot)


def solve(
    scene: SceneParams, state: RigidState, contacts: Contacts
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run mass-splitting Jacobi on the velocity state; returns (vel, ang).

    Unbatched (one env); vmap at the env layer.
    """
    inv_mass = jnp.asarray(scene.inv_mass, state.vel.dtype)  # (2,)
    inv_inertia = _world_inv_inertia(scene, state)  # (2,3,3)

    n = contacts.normal  # (C,3)
    t1, t2 = math3d.make_tangent_basis(n)
    r_a, r_b = contacts.r_a, contacts.r_b
    active = contacts.active  # (C,)

    # Mass splitting: per-body active-contact counts (static within the
    # substep — the manifold doesn't change during iterations).
    count = INC_A @ active + INC_B @ active  # (2,)
    count = jnp.maximum(count, 1.0)
    n_a, n_b_cnt = count[_IDX_A], count[_IDX_B]  # (C,)

    invm_a = inv_mass[_IDX_A] * n_a
    invm_b = inv_mass[_IDX_B] * n_b_cnt * _MASK_B
    inertia_a = inv_inertia[_IDX_A] * n_a[:, None, None]
    inertia_b = inv_inertia[_IDX_B] * (n_b_cnt * _MASK_B)[:, None, None]

    def eff_inv_mass(direction):
        def ang_term(inertia, r):
            rxd = jnp.cross(r, direction)
            return jnp.sum(
                direction * jnp.cross(jnp.einsum("cij,cj->ci", inertia, rxd), r),
                axis=-1,
            )

        k = invm_a + ang_term(inertia_a, r_a) + invm_b + ang_term(inertia_b, r_b)
        return 1.0 / k

    inv_kn = eff_inv_mass(n)  # (C,)
    inv_kt1 = eff_inv_mass(t1)
    inv_kt2 = eff_inv_mass(t2)

    # Baumgarte velocity bias: drive penetrating contacts apart.
    bias = (scene.baumgarte / scene.dt) * jnp.maximum(
        contacts.penetration - scene.slop, 0.0
    )

    mask_b = jnp.asarray(_MASK_B, state.vel.dtype)

    def rel_vel(vel, ang):
        """(C, 3) relative velocity at every slot, one shot."""
        v_a = vel[_IDX_A] + jnp.cross(ang[_IDX_A], r_a)
        v_b = vel[_IDX_B] + jnp.cross(ang[_IDX_B], r_b)
        return v_a - mask_b[:, None] * v_b

    def apply_impulses(vel, ang, imp):
        """Scatter (C, 3) impulse vectors back to the 2 bodies."""
        # Linear: Δv_b = m⁻¹_b Σ_c ±imp_c  (signed incidence matmul).
        signed = INC_A @ imp - INC_B @ imp  # (2,3)
        vel = vel + inv_mass[:, None] * signed
        # Angular: torque impulses r × imp, gathered per body then rotated
        # through the world inverse inertia.
        tau_a = jnp.cross(r_a, imp)
        tau_b = jnp.cross(r_b, imp)
        tau = INC_A @ tau_a - INC_B @ tau_b  # (2,3)
        ang = ang + jnp.einsum("bij,bj->bi", inv_inertia, tau)
        return vel, ang

    def iteration(_, carry):
        vel, ang, jn, jt1, jt2 = carry
        v = rel_vel(vel, ang)  # (C,3)

        # Normal phase: accumulated clamping at 0, all slots at once.
        vn = jnp.sum(v * n, axis=-1)
        jn_new = jnp.maximum(jn + (bias - vn) * inv_kn * active, 0.0)
        dn = jn_new - jn

        # Friction phase (same pre-impulse velocities; pyramid clamp at the
        # *updated* normal impulse).
        bound = contacts.mu * jn_new
        vt1 = jnp.sum(v * t1, axis=-1)
        vt2 = jnp.sum(v * t2, axis=-1)
        jt1_new = jnp.clip(jt1 - vt1 * inv_kt1 * active, -bound, bound)
        jt2_new = jnp.clip(jt2 - vt2 * inv_kt2 * active, -bound, bound)
        d1 = jt1_new - jt1
        d2 = jt2_new - jt2

        imp = dn[:, None] * n + d1[:, None] * t1 + d2[:, None] * t2
        vel, ang = apply_impulses(vel, ang, imp)
        return vel, ang, jn_new, jt1_new, jt2_new

    zeros = jnp.zeros((N_CONTACTS,), state.vel.dtype)
    vel, ang, _, _, _ = jax.lax.fori_loop(
        0,
        scene.solver_iterations,
        iteration,
        (state.vel, state.ang, zeros, zeros, zeros),
    )
    return vel, ang
