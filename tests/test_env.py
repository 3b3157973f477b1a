"""Gym-contract and semantics tests for the cartpole++ env layer.

Covers the reference's observable behavior (SURVEY.md §2.1 Env core row):
reset/step contract, action-repeat stacked observations, action→force table,
termination conditions, reward modes, auto-reset vectorization.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cartpoleplusplus_tpu.env import (
    Cartpole,
    CartpoleConfig,
    EnvState,
    VectorCartpole,
    action_to_force,
)
from cartpoleplusplus_tpu.env import cartpole as cartpole_mod
from cartpoleplusplus_tpu.physics import math3d
from cartpoleplusplus_tpu.physics.bodies import POLE


# Tiny cadence configs keep CPU test time reasonable.
FAST = dict(action_repeats=2, steps_per_repeat=2, initial_force_steps=4)


@pytest.fixture(scope="module")
def cfg():
    return CartpoleConfig(**FAST)


@pytest.fixture(scope="module")
def scene(cfg):
    return cartpole_mod.scene_for(cfg)


def test_action_to_force_discrete_table(cfg):
    # nop, -x, +x, -y, +y at --action-force N (reference ~L195-205).
    f = jnp.stack([action_to_force(cfg, jnp.int32(i)) for i in range(5)])
    expect = 50.0 * jnp.array(
        [[0, 0, 0], [-1, 0, 0], [1, 0, 0], [0, -1, 0], [0, 1, 0]], jnp.float32
    )
    np.testing.assert_allclose(f, expect)


def test_action_to_force_continuous_clips():
    cfg = CartpoleConfig(discrete_actions=False, **FAST)
    f = action_to_force(cfg, jnp.array([2.0, -0.5]))
    np.testing.assert_allclose(f, [50.0, -25.0, 0.0])


def test_reset_shapes_and_push(cfg, scene):
    state, obs = jax.jit(
        lambda k: cartpole_mod.reset(cfg, scene, k)
    )(jax.random.PRNGKey(0))
    assert obs.shape == cfg.lowdim_obs_shape
    assert int(state.steps) == 0 and not bool(state.done)
    # The initial-force push must leave the cart moving (reference: a nop
    # policy fails because of this push).
    assert float(jnp.linalg.norm(state.rigid.vel[0, :2])) > 0.05


def test_reset_randomized_across_keys(cfg, scene):
    r = jax.jit(lambda k: cartpole_mod.reset(cfg, scene, k))
    s1, _ = r(jax.random.PRNGKey(1))
    s2, _ = r(jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(s1.rigid.vel), np.asarray(s2.rigid.vel))


def test_step_contract(cfg, scene):
    state, _ = cartpole_mod.reset(cfg, scene, jax.random.PRNGKey(0))
    step = jax.jit(lambda s, a: cartpole_mod.step(cfg, scene, s, a))
    state, obs, reward, done = step(state, jnp.int32(0))
    assert obs.shape == cfg.lowdim_obs_shape
    assert obs.dtype == jnp.float32
    assert reward.shape == () and done.shape == ()
    assert float(reward) == pytest.approx(1.0)
    assert int(state.steps) == 1
    # Frames differ across repeats (the sim advanced between captures).
    assert not np.allclose(np.asarray(obs[0]), np.asarray(obs[-1]))


def test_timeout_termination(scene):
    cfg = CartpoleConfig(max_episode_len=3, **FAST)
    state, _ = cartpole_mod.reset(cfg, scene, jax.random.PRNGKey(3))
    step = jax.jit(lambda s, a: cartpole_mod.step(cfg, scene, s, a))
    done = False
    for i in range(3):
        state, _, _, done = step(state, jnp.int32(0))
    assert bool(done)
    assert int(state.steps) == 3


def test_tilt_termination(cfg, scene):
    # Hand the env a state with the pole well past the angle threshold.
    state, _ = cartpole_mod.reset(cfg, scene, jax.random.PRNGKey(0))
    tilted = math3d.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), 0.6)
    rigid = state.rigid.replace(quat=state.rigid.quat.at[POLE].set(tilted))
    state = state.replace(rigid=rigid)
    _, _, reward, done = cartpole_mod.step(cfg, scene, state, jnp.int32(0))
    assert bool(done)
    assert float(reward) == 0.0  # violation step pays zero (reference ~L240)


def test_position_termination(cfg, scene):
    state, _ = cartpole_mod.reset(cfg, scene, jax.random.PRNGKey(0))
    rigid = state.rigid.replace(
        pos=state.rigid.pos.at[POLE, 0].set(5.0),
        # keep it from re-entering bounds mid-step
        vel=jnp.zeros_like(state.rigid.vel),
    )
    # Lift pole off surfaces so it cannot interact.
    rigid = rigid.replace(pos=rigid.pos.at[POLE, 2].set(3.0))
    state = state.replace(rigid=rigid)
    _, _, _, done = cartpole_mod.step(cfg, scene, state, jnp.int32(0))
    assert bool(done)


def test_reward_calc_modes(scene):
    key = jax.random.PRNGKey(0)
    rewards = {}
    for mode in ("fixed", "angle", "action", "angle_action"):
        cfg = CartpoleConfig(reward_calc=mode, **FAST)
        state, _ = cartpole_mod.reset(cfg, scene, key)
        _, _, r, _ = cartpole_mod.step(cfg, scene, state, jnp.int32(1))
        rewards[mode] = float(r)
    assert rewards["fixed"] == pytest.approx(1.0)
    assert 0.0 < rewards["angle"] <= 1.0
    assert rewards["action"] == pytest.approx(rewards["fixed"] - 0.1)
    assert rewards["angle_action"] <= rewards["angle"]


def test_gym_wrapper_roundtrip(cfg):
    env = Cartpole(cfg, seed=0)
    obs = env.reset()
    assert obs.shape == cfg.lowdim_obs_shape
    total = 0.0
    for _ in range(4):
        a = env.action_space.sample()
        obs, r, done, info = env.step(a)
        total += r
        if done:
            assert "done_reason" in info
            break
    assert obs.shape == cfg.lowdim_obs_shape
    assert total > 0.0


def test_vector_env_autoreset(cfg):
    venv = VectorCartpole(cfg, num_envs=4)
    rng = jax.random.PRNGKey(0)
    states, obs = jax.jit(venv.reset)(rng)
    assert obs.shape == (4,) + cfg.lowdim_obs_shape

    # Force env 0 terminal by pushing its pole out of bounds.
    pos = states.rigid.pos.at[0, POLE, 0].set(5.0).at[0, POLE, 2].set(3.0)
    states = states.replace(rigid=states.rigid.replace(pos=pos))

    step = jax.jit(venv.step)
    new_states, obs, reward, done, next_obs = step(
        states, jnp.zeros((4,), jnp.int32), jax.random.PRNGKey(1)
    )
    assert bool(done[0]) and not bool(done[1])
    # Env 0 was auto-reset: fresh episode counters.
    assert int(new_states.steps[0]) == 0
    assert int(new_states.steps[1]) == 1
    assert not bool(new_states.done[0])
    # The carried obs for the reset env must be the RESET observation, not
    # the terminal frame (stale-obs/replay-corruption bug, ADVICE round 1):
    # env 0's pole was pushed to x=5, so its terminal frame differs from any
    # fresh reset frame near the origin.
    assert not np.allclose(np.asarray(next_obs[0]), np.asarray(obs[0]))
    # Non-terminated envs carry the transition obs unchanged.
    np.testing.assert_array_equal(np.asarray(next_obs[1]), np.asarray(obs[1]))


def test_vector_env_reset_pool(cfg):
    venv = VectorCartpole(cfg, num_envs=3)
    pool = venv.reset(jax.random.PRNGKey(7))
    states, _ = venv.reset(jax.random.PRNGKey(0))
    pos = states.rigid.pos.at[2, POLE, 0].set(5.0).at[2, POLE, 2].set(3.0)
    states = states.replace(rigid=states.rigid.replace(pos=pos))
    new_states, _, _, done, next_obs = jax.jit(venv.step)(
        states, jnp.zeros((3,), jnp.int32), jax.random.PRNGKey(1), reset_pool=pool
    )
    assert bool(done[2])
    pool_states, pool_obs = pool
    np.testing.assert_allclose(
        np.asarray(new_states.rigid.pos[2]), np.asarray(pool_states.rigid.pos[2])
    )
    # The carried obs for the reset env comes from the pool too.
    np.testing.assert_array_equal(
        np.asarray(next_obs[2]), np.asarray(pool_obs[2])
    )


def test_pixel_obs_shape_metadata():
    cfg = CartpoleConfig(use_raw_pixels=True, num_cameras=2, **FAST)
    assert cfg.obs_shape == (2, 2 * 50 * 50 * 3)


def test_batched_matches_vmapped(cfg, scene):
    # The SoA batched fast path must agree with vmap over the per-env step.
    import numpy as np

    keys = jax.random.split(jax.random.PRNGKey(9), 3)
    s_v, o_v = jax.vmap(lambda k: cartpole_mod.reset(cfg, scene, k))(keys)
    s_b, o_b = cartpole_mod.reset_batched(cfg, scene, jax.random.PRNGKey(9), 3)
    # Same RNG usage differs (split per env vs batched draws), so compare the
    # *step* on identical initial states instead of the reset randomness.
    actions = jnp.array([0, 2, 4], jnp.int32)
    nv, ov, rv, dv = jax.vmap(
        lambda s, a: cartpole_mod.step(cfg, scene, s, a)
    )(s_v, actions)
    nb, ob, rb, db = cartpole_mod.step_batched(cfg, scene, s_v, actions)
    np.testing.assert_allclose(np.asarray(ob), np.asarray(ov), atol=2e-4)
    np.testing.assert_allclose(np.asarray(rb), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(db), np.asarray(dv))
    np.testing.assert_allclose(
        np.asarray(nb.rigid.pos), np.asarray(nv.rigid.pos), atol=2e-4
    )


def test_reset_batched_shapes_and_push(cfg, scene):
    import numpy as np

    states, obs = jax.jit(
        lambda k: cartpole_mod.reset_batched(cfg, scene, k, 5)
    )(jax.random.PRNGKey(0))
    assert obs.shape == (5,) + cfg.lowdim_obs_shape
    assert states.steps.shape == (5,)
    speeds = np.linalg.norm(np.asarray(states.rigid.vel[:, 0, :2]), axis=-1)
    assert (speeds > 0.05).all(), "every env got an initial push"
    # Pushes point in different directions across envs.
    dirs = np.asarray(states.rigid.vel[:, 0, :2])
    assert np.std(dirs / np.maximum(speeds[:, None], 1e-6), axis=0).max() > 0.1
