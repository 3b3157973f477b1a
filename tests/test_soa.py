"""SoA physics fast path: equivalence with the AoS reference engine.

physics/soa.py re-expresses the same substep (gravity → contacts →
mass-splitting Jacobi → integrate) with the env axis as the trailing vector
axis.  These tests pin it bit-close to engine.step_substeps across the
regimes that matter: free flight, resting contact, pushes, topples.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cartpoleplusplus_tpu.physics import engine, math3d, soa
from cartpoleplusplus_tpu.physics.bodies import (
    CART,
    POLE,
    make_scene,
    rest_state,
)


@pytest.fixture(scope="module")
def scene():
    return make_scene()


def batchify(state, forces):
    """Stack per-env initial states for a list of (state-mod, force) cases."""
    states = jax.tree.map(lambda *xs: jnp.stack(xs), *state)
    return states, jnp.stack(forces)


def make_cases(scene):
    base = rest_state(scene)
    cases, forces = [], []
    # free fall
    cases.append(base.replace(pos=base.pos + jnp.array([0.0, 0.0, 5.0])))
    forces.append(jnp.zeros(3))
    # rest under gravity
    cases.append(base)
    forces.append(jnp.zeros(3))
    # pushed cart
    cases.append(base)
    forces.append(jnp.array([30.0, 10.0, 0.0]))
    # tilted pole (topple regime)
    tilt = math3d.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), 0.3)
    cases.append(base.replace(quat=base.quat.at[POLE].set(tilt)))
    forces.append(jnp.zeros(3))
    # moving pole sliding off
    cases.append(base.replace(vel=base.vel.at[POLE].set(jnp.array([1.0, 0.5, 0.0]))))
    forces.append(jnp.array([-20.0, 0.0, 0.0]))
    return batchify(cases, forces)


def test_soa_matches_aos_single_substep(scene):
    states, forces = make_cases(scene)
    aos = jax.jit(
        jax.vmap(lambda s, f: engine.step_substeps(scene, s, f, 1))
    )(states, forces)
    out = jax.jit(lambda s, f: soa.step_substeps_batched(scene, s, f, 1))(
        states, forces
    )
    for field in ("pos", "quat", "vel", "ang"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, field)),
            np.asarray(getattr(aos, field)),
            atol=1e-5,
            err_msg=field,
        )


def test_soa_matches_aos_long_horizon(scene):
    states, forces = make_cases(scene)
    n = 120  # 0.5 s
    aos = jax.jit(
        jax.vmap(lambda s, f: engine.step_substeps(scene, s, f, n))
    )(states, forces)
    out = jax.jit(lambda s, f: soa.step_substeps_batched(scene, s, f, n))(
        states, forces
    )
    # Chaotic contact dynamics amplify fp differences; positions must stay
    # close, velocities looser.
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(aos.pos), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.quat), np.asarray(aos.quat), atol=5e-3
    )


def test_soa_rest_is_stable(scene):
    base = rest_state(scene)
    states = jax.tree.map(lambda x: jnp.stack([x] * 8), base)
    out = jax.jit(
        lambda s: soa.step_substeps_batched(scene, s, jnp.zeros((8, 3)), 480)
    )(states)
    np.testing.assert_allclose(np.asarray(out.pos[:, CART, 2]), 0.1, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out.pos[:, POLE, 2]), 0.7, atol=5e-3)
    assert float(jnp.max(jnp.abs(out.vel))) < 0.05


def test_soa_roundtrip_layout():
    scene = make_scene()
    base = rest_state(scene)
    states = jax.tree.map(lambda x: jnp.stack([x] * 3), base)
    s = soa.from_rigid(states)
    back = soa.to_rigid(s)
    for field in ("pos", "quat", "vel", "ang"):
        np.testing.assert_allclose(
            np.asarray(getattr(back, field)), np.asarray(getattr(states, field))
        )


def test_soa_matches_aos_randomized_fuzz(scene):
    """256 random poses/velocities (round-3 hardening for the slot-group-
    specialized solver, soa.py section-2 comment): arbitrary cart/pole
    orientations exercise every manifold group — ground slots with tilted
    bodies, the rotating pole-on-cart frame, inactive slots — against the
    general AoS formulas of engine.substep."""
    rng = np.random.default_rng(7)
    E = 256
    base = rest_state(scene)

    def rand_quat():
        q = rng.normal(size=4)
        return q / np.linalg.norm(q)

    pos = np.tile(np.asarray(base.pos)[None], (E, 1, 1))
    pos[:, :, :2] += rng.uniform(-0.3, 0.3, size=(E, 2, 2))
    pos[:, :, 2] += rng.uniform(-0.02, 0.4, size=(E, 2))
    quat = np.stack(
        [np.stack([rand_quat(), rand_quat()]) for _ in range(E)]
    ).astype(np.float32)
    vel = rng.uniform(-2.0, 2.0, size=(E, 2, 3)).astype(np.float32)
    ang = rng.uniform(-4.0, 4.0, size=(E, 2, 3)).astype(np.float32)
    states = base.replace(
        pos=jnp.asarray(pos, jnp.float32), quat=jnp.asarray(quat),
        vel=jnp.asarray(vel), ang=jnp.asarray(ang),
    )
    forces = jnp.asarray(
        rng.uniform(-40.0, 40.0, size=(E, 3)), jnp.float32
    )

    n = 12
    aos = jax.jit(
        jax.vmap(lambda s, f: engine.step_substeps(scene, s, f, n))
    )(states, forces)
    out = jax.jit(lambda s, f: soa.step_substeps_batched(scene, s, f, n))(
        states, forces
    )
    for field, tol in (("pos", 1e-4), ("quat", 1e-4), ("vel", 5e-3), ("ang", 2e-2)):
        np.testing.assert_allclose(
            np.asarray(getattr(out, field)),
            np.asarray(getattr(aos, field)),
            atol=tol,
            err_msg=field,
        )


def test_soa_matches_aos_tilted_gravity():
    """SceneParams.gravity is a public (3,) field; a tilted vector must move
    cart AND pole identically in both paths (the x/y components were once
    silently dropped by the SoA substep)."""
    from cartpoleplusplus_tpu.physics.bodies import make_scene, replace_scene

    tilted = replace_scene(
        make_scene(), gravity=np.array([1.5, -0.8, -9.81], np.float32)
    )
    states, forces = make_cases(tilted)
    n = 30
    aos = jax.jit(
        jax.vmap(lambda s, f: engine.step_substeps(tilted, s, f, n))
    )(states, forces)
    out = jax.jit(lambda s, f: soa.step_substeps_batched(tilted, s, f, n))(
        states, forces
    )
    # The free-fall case must show lateral drift (gravity x/y actually
    # applied), not just match a gravity-less trajectory.
    assert float(jnp.abs(out.vel[0, :, 0]).min()) > 0.05
    for field, tol in (("pos", 1e-4), ("quat", 1e-4), ("vel", 5e-3)):
        np.testing.assert_allclose(
            np.asarray(getattr(out, field)),
            np.asarray(getattr(aos, field)),
            atol=tol,
            err_msg=field,
        )
