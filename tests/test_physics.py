"""Analytic physics tests for the TPU rigid-body core.

The reference has no tests (SURVEY.md §4); this suite is the fidelity harness
the rebuild substitutes for Bullet: known closed-form trajectories, contact
stability, impulse response, and energy accounting.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cartpoleplusplus_tpu.physics import engine, math3d
from cartpoleplusplus_tpu.physics.bodies import (
    CART,
    POLE,
    RigidState,
    make_scene,
    rest_state,
)

NO_FORCE = jnp.zeros(3)


@pytest.fixture(scope="module")
def scene():
    return make_scene()


def run(scene, state, force=NO_FORCE, steps=240):
    step = jax.jit(
        lambda s: engine.step_substeps(scene, s, force, steps)
    )
    return step(state)


def test_free_fall_matches_kinematics(scene):
    # Lift both bodies high above the ground: no contacts, pure ballistic fall.
    state = rest_state(scene)
    state = state.replace(pos=state.pos + jnp.array([0.0, 0.0, 10.0]))
    t = 0.25
    n = int(round(t / float(scene.dt)))
    out = run(scene, state, steps=n)
    # Semi-implicit Euler: z(t) = z0 - g·dt·(1+2+..+n) = z0 - g·dt²·n(n+1)/2
    dt = float(scene.dt)
    drop = 9.81 * dt * dt * n * (n + 1) / 2.0
    np.testing.assert_allclose(
        out.pos[:, 2], state.pos[:, 2] - drop, rtol=1e-4
    )
    np.testing.assert_allclose(out.vel[:, 2], -9.81 * dt * n, rtol=1e-4)


def test_rest_state_is_stable(scene):
    # The canonical scene — pole standing freely on the cart — must sit still
    # for 2 simulated seconds (the core free-standing-contact stability test).
    out = run(scene, rest_state(scene), steps=480)
    np.testing.assert_allclose(out.pos[CART, :2], 0.0, atol=2e-3)
    np.testing.assert_allclose(out.pos[POLE, :2], 0.0, atol=2e-3)
    # Heights stay at rest values (small solver slop allowed).
    assert abs(float(out.pos[CART, 2]) - 0.1) < 5e-3
    assert abs(float(out.pos[POLE, 2]) - 0.7) < 5e-3
    # Pole stays upright.
    assert float(math3d.quat_tilt_angle(out.quat[POLE])) < 0.02
    # Velocities negligible.
    assert float(jnp.max(jnp.abs(out.vel))) < 0.05


def test_cart_impulse_response():
    # Push the cart with a constant force; with friction μ it accelerates at
    # a ≈ F/m_total − μ·g once sliding (pole rides on top).  Uses an explicit
    # unit-mass, high-ground-friction scene so the closed form is simple.
    scene = make_scene(cart_mass=1.0, friction_cart_ground=0.5)
    force = jnp.array([10.0, 0.0, 0.0])
    t = 0.5
    n = int(round(t / float(scene.dt)))
    out = run(scene, rest_state(scene), force=force, steps=n)
    m_total = 1.1  # cart 1.0 + pole 0.1 riding on it
    mu = 0.5
    a = 10.0 / m_total - mu * 9.81
    expect_v = a * t
    assert float(out.vel[CART, 0]) == pytest.approx(expect_v, rel=0.25)
    # The cart moved in +x and stayed on the ground.
    assert float(out.pos[CART, 0]) > 0.05
    assert abs(float(out.pos[CART, 2]) - 0.1) < 5e-3


@pytest.mark.parametrize("iters,bound", [(3, 1.5e-2), (5, 1e-2)])
def test_static_friction_holds_small_force(iters, bound):
    # A force below μ·m·g must not budge the cart (static friction).
    # Jacobi under-convergence leaks a small creep under a SUSTAINED
    # sub-threshold force (per-second drift: 11.2 mm @3 iters, 5.7 mm @5,
    # 0.19 mm @30) — the 3-iteration default trades ~5 mm/s of creep in
    # this corner for the measured +19% low-dim throughput (BASELINE.md
    # round 4); the 5-iteration row pins the solver's tighter capability
    # so a solver change can't hide behind the looser default bound.
    scene = make_scene(cart_mass=1.0, friction_cart_ground=0.5,
                       solver_iterations=iters)
    force = jnp.array([2.0, 0.0, 0.0])  # μ·(m_c+m_p)·g ≈ 5.4 N
    out = run(scene, rest_state(scene), force=force, steps=240)
    assert abs(float(out.pos[CART, 0])) < bound
    assert abs(float(out.vel[CART, 0])) < 5e-2


def test_balance_point_is_at_support_edge(scene):
    # A free-standing box pole balances until its COM passes the support
    # corner at tilt* = atan(hx / hz) ≈ 0.0997 rad.  Just inside that angle it
    # must right itself / hold; the topple test below goes well past it.
    state = rest_state(scene)
    tilt = math3d.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), 0.08)
    quat = state.quat.at[POLE].set(tilt)
    bottom = math3d.quat_rotate(tilt, jnp.array([0.0, 0.0, -0.5]))
    pos = state.pos.at[POLE].set(jnp.array([0.0, 0.0, 0.2]) - bottom)
    out = run(scene, state.replace(quat=quat, pos=pos), steps=240)
    assert float(math3d.quat_tilt_angle(out.quat[POLE])) < 0.12


def test_pole_topples_when_tilted(scene):
    # Tilt the pole 0.25 rad — well past the static balance angle — so
    # gravity must topple it (inverted-pendulum instability, the defining
    # dynamic of cartpole++).
    state = rest_state(scene)
    tilt = math3d.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), 0.25)
    quat = state.quat.at[POLE].set(tilt)
    # Shift pole COM so the bottom face still touches the cart top.
    bottom = math3d.quat_rotate(tilt, jnp.array([0.0, 0.0, -0.5]))
    pos = state.pos.at[POLE].set(
        jnp.array([0.0, 0.0, float(2 * 0.1)]) - bottom
    )
    state = state.replace(quat=quat, pos=pos)
    out = run(scene, state, steps=240)  # 1 s
    ang_after = float(math3d.quat_tilt_angle(out.quat[POLE]))
    assert ang_after > 0.6, f"pole should topple, tilt={ang_after}"


def test_pole_falls_to_ground_and_rests(scene):
    # Fully topple: after a few seconds the pole lies on the ground (or the
    # cart edge) with low velocity — contacts must not explode.
    state = rest_state(scene)
    state = state.replace(vel=state.vel.at[POLE].set(jnp.array([1.5, 0.0, 0.0])))
    out = run(scene, state, steps=240 * 4)
    assert float(jnp.max(jnp.abs(out.vel))) < 1.0, "system should settle"
    assert float(out.pos[POLE, 2]) < 0.45, "pole should have fallen"
    # Nothing tunnelled through the floor.
    assert float(jnp.min(out.pos[:, 2])) > 0.0


def test_energy_never_increases_at_rest(scene):
    # Resting contact must not pump energy (Baumgarte bounded by slop).
    state = rest_state(scene)
    e0 = float(
        engine.kinetic_energy(scene, state) + engine.potential_energy(scene, state)
    )
    out = run(scene, state, steps=480)
    e1 = float(
        engine.kinetic_energy(scene, out) + engine.potential_energy(scene, out)
    )
    assert e1 < e0 + 1e-2


def test_vmap_batch_consistency(scene):
    # A batch of identical states stepped under vmap equals the single-env
    # result — the property that makes 4096-env simulation trustworthy.
    state = rest_state(scene)
    single = run(scene, state, steps=24)
    batch = jax.tree.map(lambda x: jnp.stack([x] * 4), state)
    stepped = jax.jit(
        jax.vmap(lambda s: engine.step_substeps(scene, s, NO_FORCE, 24))
    )(batch)
    for i in range(4):
        np.testing.assert_allclose(
            jax.tree.map(lambda x: x[i], stepped).pos, single.pos, atol=1e-5
        )


def test_cart_dropped_lands_upright(scene):
    # Drop the cart from 0.5 m: it must land and settle without bouncing off
    # (restitution 0) or sinking through the plane.
    state = rest_state(scene)
    pos = state.pos.at[CART, 2].add(0.5).at[POLE, 2].add(0.5)
    out = run(scene, state.replace(pos=pos), steps=240 * 3)
    assert abs(float(out.pos[CART, 2]) - 0.1) < 2e-2
    assert float(jnp.max(jnp.abs(out.vel[CART]))) < 0.2
