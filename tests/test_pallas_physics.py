"""Pallas physics kernel: equivalence with the XLA SoA path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from cartpoleplusplus_tpu.physics import math3d, soa
from cartpoleplusplus_tpu.physics.bodies import POLE, make_scene, rest_state
from cartpoleplusplus_tpu.physics.pallas_step import step_substeps_pallas

E = 1024  # one default tile


def _cases(scene):
    base = rest_state(scene)
    tilted = base.replace(
        quat=base.quat.at[POLE].set(
            math3d.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), 0.2)
        )
    )
    lifted = base.replace(pos=base.pos + jnp.array([0.0, 0.0, 2.0]))
    protos = [base, tilted, lifted, base]
    rigid = jax.tree.map(
        lambda *xs: jnp.concatenate([jnp.stack(list(xs))] * (E // 4)),
        *protos,
    )
    key = jax.random.PRNGKey(0)
    force = 20.0 * jax.random.normal(key, (E, 3)) * jnp.array([1.0, 1.0, 0.0])
    return rigid, force


def test_pallas_physics_matches_soa():
    scene = make_scene()
    rigid, force = _cases(scene)
    n = 10
    ref = jax.jit(lambda s, f: soa.step_substeps_batched(scene, s, f, n))(
        rigid, force
    )
    out = step_substeps_pallas(scene, rigid, force, n, interpret=True)
    for field in ("pos", "quat", "vel", "ang"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, field)),
            np.asarray(getattr(ref, field)),
            atol=1e-5,
            err_msg=field,
        )


def test_pallas_physics_rest_stability():
    scene = make_scene()
    base = rest_state(scene)
    rigid = jax.tree.map(lambda x: jnp.stack([x] * E), base)
    out = step_substeps_pallas(
        scene, rigid, jnp.zeros((E, 3)), 120, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out.pos[:, 1, 2]), 0.7, atol=5e-3)
    assert float(jnp.max(jnp.abs(out.vel))) < 0.05


def test_pallas_repeats_matches_per_repeat_calls():
    """step_repeats_pallas ≡ R sequential step_substeps_pallas calls, and its
    pose snapshots are exactly the per-repeat poses (the batched renderer's
    input contract)."""
    from cartpoleplusplus_tpu.physics.pallas_step import step_repeats_pallas

    scene = make_scene()
    rigid, force = _cases(scene)
    spr, repeats = 5, 3

    out, poses = step_repeats_pallas(
        scene, rigid, force, spr, repeats, interpret=True
    )
    assert poses.shape == (repeats, E, 16)

    ref = rigid
    for r in range(repeats):
        ref = step_substeps_pallas(scene, ref, force, spr, interpret=True)
        expect = jnp.concatenate(
            [
                ref.pos[:, 0], ref.quat[:, 0], ref.pos[:, 1], ref.quat[:, 1],
                jnp.zeros((E, 2)),
            ],
            axis=-1,
        )
        np.testing.assert_allclose(
            np.asarray(poses[r]), np.asarray(expect), atol=1e-5,
            err_msg=f"repeat {r}",
        )
    for field in ("pos", "quat", "vel", "ang"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, field)),
            np.asarray(getattr(ref, field)),
            atol=1e-5,
            err_msg=field,
        )
