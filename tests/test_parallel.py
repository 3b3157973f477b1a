"""Multi-chip tests on the virtual 8-device CPU mesh (SURVEY.md §4).

The TPU analogue of "distributed tests without a cluster": the same fused
DDPG segment runs (a) single-device and (b) shard_mapped over 8 devices, and
the sharded run must keep parameters replicated and train sanely.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cartpoleplusplus_tpu.agents import ddpg as ddpg_mod
from cartpoleplusplus_tpu.env import CartpoleConfig, VectorCartpole
from cartpoleplusplus_tpu.models import Actor, Critic
from cartpoleplusplus_tpu.parallel import (
    global_ddpg_state,
    make_distributed_segment,
    make_mesh,
)

CFG = CartpoleConfig(
    discrete_actions=False,
    action_repeats=2,
    steps_per_repeat=2,
    initial_force_steps=4,
    max_episode_len=20,
)

N_DEV = 8
GLOBAL_ENVS = 16  # 2 per device
CAPACITY = 256  # divisible by N_DEV


@pytest.fixture(scope="module")
def nets():
    actor = Actor(action_dim=2, hidden=(16, 16))
    critic = Critic(hidden=(16, 16))
    return actor, critic, optax.adam(1e-3), optax.adam(1e-3)


def test_mesh_construction():
    mesh = make_mesh(N_DEV)
    assert mesh.devices.shape == (N_DEV,)
    assert mesh.axis_names == ("env",)


def test_distributed_segment_runs_and_keeps_params_replicated(nets):
    actor, critic, atx, ctx = nets
    mesh = make_mesh(N_DEV)
    local_venv = VectorCartpole(CFG, num_envs=GLOBAL_ENVS // N_DEV)
    build, shard_state = make_distributed_segment(
        mesh, local_venv, actor, critic, atx, ctx,
        batch_size=8, warmup_steps=2, steps_per_segment=4,
    )
    st = global_ddpg_state(CFG, GLOBAL_ENVS, CAPACITY, actor, critic, atx, ctx)
    st = shard_state(st)
    segment = build(st)

    p_before = jax.device_get(st.actor_params)
    for _ in range(3):
        st, metrics = segment(st)
    assert float(metrics["reward"]) > 0.0
    # Training happened (params changed) and replicas stayed in sync
    # (fetching a replicated array returns a consistent single value).
    p_after = jax.device_get(st.actor_params)
    diff = jax.tree.reduce(
        lambda acc, xy: acc + float(jnp.sum(jnp.abs(xy))),
        jax.tree.map(lambda a, b: jnp.asarray(np.abs(a - b).sum()), p_before, p_after),
        0.0,
    )
    assert diff > 0.0, "params should have been updated"
    assert int(st.env_steps) == 12
    # Replay cursor advanced identically on every shard (replicated scalar).
    assert int(st.replay.cursor) == (GLOBAL_ENVS // N_DEV) * 12 % (CAPACITY // N_DEV)


def test_distributed_env_shards_differ(nets):
    # Each device's env shard must follow its own trajectory (decorrelated
    # RNG streams), otherwise the parallelism is fake.
    actor, critic, atx, ctx = nets
    mesh = make_mesh(N_DEV)
    local_venv = VectorCartpole(CFG, num_envs=GLOBAL_ENVS // N_DEV)
    build, shard_state = make_distributed_segment(
        mesh, local_venv, actor, critic, atx, ctx,
        batch_size=8, warmup_steps=2, steps_per_segment=2,
    )
    st = shard_state(
        global_ddpg_state(CFG, GLOBAL_ENVS, CAPACITY, actor, critic, atx, ctx)
    )
    segment = build(st)
    st, _ = segment(st)
    pos = np.asarray(st.env_states.rigid.pos)  # (GLOBAL_ENVS, 2, 3)
    shard0 = pos[: GLOBAL_ENVS // N_DEV]
    shard1 = pos[GLOBAL_ENVS // N_DEV : 2 * GLOBAL_ENVS // N_DEV]
    assert not np.allclose(shard0, shard1), "env shards must evolve independently"
