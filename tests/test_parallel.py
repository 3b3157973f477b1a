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
    st = global_ddpg_state(
        CFG, GLOBAL_ENVS, CAPACITY, actor, critic, atx, ctx, num_devices=N_DEV
    )
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


def test_distributed_is_noop_at_one_device(nets):
    """SURVEY §4: single-chip vs multi-chip equivalence on the same seed.

    The distributed machinery on a 1-device mesh must reproduce the plain
    jitted segment exactly (the per-device rng fold-in is axis_index=0, so
    pre-folding the plain path's key with 0 aligns the streams).  This pins
    that shard_map + specs + pmean change NOTHING about the math — scaling
    out is a pure sharding annotation.
    """
    actor, critic, atx, ctx = nets
    kw = dict(batch_size=8, warmup_steps=2, steps_per_segment=4)
    st0 = global_ddpg_state(CFG, 4, 32, actor, critic, atx, ctx)

    venv = VectorCartpole(CFG, num_envs=4)
    # Plain path FIRST: shard_state may alias st0's buffers on this backend
    # and the distributed segment donates them.
    seg_p = jax.jit(
        ddpg_mod.make_segment(
            venv, actor, critic, atx, ctx,
            gamma=0.99, tau=0.005, ou_theta=0.15, ou_sigma=0.2, **kw
        )
    )
    st_p = st0.replace(rng=jax.random.fold_in(st0.rng, 0))
    st_p, m_p = seg_p(st_p)

    mesh = make_mesh(1)
    build, shard_state = make_distributed_segment(
        mesh, venv, actor, critic, atx, ctx, **kw
    )
    st_d = shard_state(st0)
    st_d, m_d = build(st_d)(st_d)

    for a, b in zip(
        jax.tree.leaves(st_d.actor_params), jax.tree.leaves(st_p.actor_params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(st_d.env_states.rigid.pos),
        np.asarray(st_p.env_states.rigid.pos),
        atol=1e-6,
    )
    for k in m_p:
        np.testing.assert_allclose(float(m_d[k]), float(m_p[k]), atol=1e-5)


def test_ddpg_segment_1_vs_8_devices_same_seed(nets):
    """SURVEY §4's promised single-chip vs multi-chip equivalence on the
    SAME seed, on the full DDPG segment.

    With exploration noise off (σ=0) and training gated out (warmup > K),
    the segment's remaining math — actor forward, physics, render, replay
    writes, auto-reset — is deterministic and shard-local, so 8 devices must
    reproduce the single-device trajectory exactly.  (With noise/training on,
    per-device RNG decorrelation makes trajectories legitimately different;
    the 1-device noop test pins that machinery instead.)
    """
    actor, critic, atx, ctx = nets
    kw = dict(
        batch_size=8, warmup_steps=100, steps_per_segment=3,
        ou_theta=0.15, ou_sigma=0.0,
    )
    # Single device, all 16 envs in one batch (replay block = 16).
    st0 = global_ddpg_state(CFG, GLOBAL_ENVS, CAPACITY, actor, critic, atx, ctx)
    venv = VectorCartpole(CFG, num_envs=GLOBAL_ENVS)
    seg_1 = jax.jit(
        ddpg_mod.make_segment(venv, actor, critic, atx, ctx,
                              gamma=0.99, tau=0.005, **kw)
    )
    st_1, _ = seg_1(st0)
    pos_1 = np.asarray(st_1.env_states.rigid.pos)
    s1_1 = np.asarray(st_1.replay.s1)

    # 8 devices, 2 envs per shard, same global state/seed.
    mesh = make_mesh(N_DEV)
    local_venv = VectorCartpole(CFG, num_envs=GLOBAL_ENVS // N_DEV)
    build, shard_state = make_distributed_segment(
        mesh, local_venv, actor, critic, atx, ctx, gamma=0.99, tau=0.005, **kw
    )
    st_8 = shard_state(
        global_ddpg_state(
            CFG, GLOBAL_ENVS, CAPACITY, actor, critic, atx, ctx,
            num_devices=N_DEV,
        )
    )
    st_8, _ = build(st_8)(st_8)
    np.testing.assert_allclose(
        np.asarray(st_8.env_states.rigid.pos), pos_1, atol=1e-6
    )
    # Replay rows: the global buffer writes env-major blocks of 16; each
    # shard writes blocks of 2 — rows interleave differently, so compare the
    # SET of written observations per step instead.
    s1_8 = np.asarray(st_8.replay.s1)
    written = GLOBAL_ENVS * kw["steps_per_segment"]
    cap_shard = CAPACITY // N_DEV
    rows_8 = np.concatenate([
        s1_8[d * cap_shard : d * cap_shard + 2 * kw["steps_per_segment"]]
        for d in range(N_DEV)
    ])
    key = lambda arr: np.sort(arr.reshape(arr.shape[0], -1).sum(axis=1))
    np.testing.assert_allclose(
        key(rows_8), key(s1_1[:written]), atol=1e-5
    )


def test_sharded_sim_matches_global():
    """Physics/env sharding equivalence: envs are truly independent.

    Stepping 16 envs in one batch must equal stepping the same envs as 8
    separate 2-env shards — i.e. the batched SoA physics has no hidden
    cross-env coupling, which is what makes env-dim sharding exact.
    """
    from cartpoleplusplus_tpu.env import cartpole as cartpole_mod

    venv = VectorCartpole(CFG, num_envs=16)
    states, obs = venv.reset(jax.random.PRNGKey(3))
    action = jax.random.uniform(jax.random.PRNGKey(4), (16, 2), minval=-1, maxval=1)

    g_states, g_obs, g_rew, g_done = cartpole_mod.step_batched(
        CFG, venv.scene, states, action, None
    )
    for s in range(8):
        sl = slice(2 * s, 2 * s + 2)
        shard_states = jax.tree.map(lambda x: x[sl], states)
        s_states, s_obs, s_rew, s_done = cartpole_mod.step_batched(
            CFG, venv.scene, shard_states, action[sl], None
        )
        np.testing.assert_allclose(
            np.asarray(s_states.rigid.pos),
            np.asarray(g_states.rigid.pos[sl]),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(s_rew), np.asarray(g_rew[sl]), atol=1e-6
        )


def _agent_cli_multidevice(module, extra=()):
    """Drive an agent's train() end-to-end with --num-devices 8."""
    from cartpoleplusplus_tpu.agents import common as common_mod

    parser = common_mod.make_parser("t")
    for name in ("add_dqn_opts", "add_naf_opts", "add_ddpg_opts",
                 "add_lrpg_opts", "add_sac_opts", "add_ppo_opts"):
        if hasattr(module, name):
            getattr(module, name)(parser)
    argv = [
        "--num-devices", "8", "--num-train-batches", "2", "--num-envs", "16",
        "--num-eval", "4", "--action-repeats", "2", "--steps-per-repeat", "2",
        "--max-episode-len", "10", "--eval-freq", "1",
    ] + list(extra)
    opts = parser.parse_args(argv)
    final = module.train(opts)
    assert np.isfinite(final) and final > 0.0


def test_dqn_multidevice_cli():
    from cartpoleplusplus_tpu.agents import dqn

    _agent_cli_multidevice(
        dqn,
        ["--steps-per-segment", "3", "--batch-size", "16",
         "--replay-capacity", "128", "--warmup-steps", "1"],
    )


def test_dqn_per_multidevice_cli():
    # Prioritized replay under DP: priority shards along capacity with the
    # data rows; each shard samples its own masked CDF.
    from cartpoleplusplus_tpu.agents import dqn

    _agent_cli_multidevice(
        dqn,
        ["--steps-per-segment", "3", "--batch-size", "16",
         "--replay-capacity", "128", "--warmup-steps", "1", "--per"],
    )


def test_naf_multidevice_cli():
    from cartpoleplusplus_tpu.agents import naf

    _agent_cli_multidevice(
        naf,
        ["--steps-per-segment", "3", "--batch-size", "16",
         "--replay-capacity", "128", "--warmup-steps", "1"],
    )


def test_sac_multidevice_cli():
    from cartpoleplusplus_tpu.agents import sac

    _agent_cli_multidevice(
        sac,
        ["--steps-per-segment", "3", "--batch-size", "16",
         "--replay-capacity", "128", "--warmup-steps", "1"],
    )


def test_lrpg_multidevice_cli():
    from cartpoleplusplus_tpu.agents import lrpg

    _agent_cli_multidevice(lrpg)


def test_ppo_multidevice_cli():
    from cartpoleplusplus_tpu.agents import ppo

    _agent_cli_multidevice(
        ppo,
        ["--rollout-steps", "4", "--ppo-minibatches", "2",
         "--ppo-epochs", "2"],
    )


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
        global_ddpg_state(
            CFG, GLOBAL_ENVS, CAPACITY, actor, critic, atx, ctx,
            num_devices=N_DEV,
        )
    )
    segment = build(st)
    st, _ = segment(st)
    pos = np.asarray(st.env_states.rigid.pos)  # (GLOBAL_ENVS, 2, 3)
    shard0 = pos[: GLOBAL_ENVS // N_DEV]
    shard1 = pos[GLOBAL_ENVS // N_DEV : 2 * GLOBAL_ENVS // N_DEV]
    assert not np.allclose(shard0, shard1), "env shards must evolve independently"


def test_state_specs_tolerates_priority_none():
    """A hand-built ReplayState with priority=None (the dataclass default)
    must produce a spec tree with the SAME structure — None is an empty
    pytree node, so a P() spec there would crash every tree_map over
    (state, specs) including shard_state (round-5 review finding)."""
    from flax import struct

    from cartpoleplusplus_tpu.parallel.distributed import state_specs
    from cartpoleplusplus_tpu.replay import ReplayState

    @struct.dataclass
    class S:
        replay: ReplayState
        params: dict

    rs = ReplayState(
        s1=jnp.zeros((8, 3)), action=jnp.zeros((8, 2)),
        reward=jnp.zeros((8,)), s2=jnp.zeros((8, 3)),
        terminal=jnp.zeros((8,), bool),
        cursor=jnp.zeros((), jnp.int32), size=jnp.zeros((), jnp.int32),
    )
    assert rs.priority is None
    st = S(replay=rs, params={"w": jnp.zeros((4, 4))})
    specs = state_specs(st, "env", ("replay",))
    # Structures must match, or this tree_map raises.
    zipped = jax.tree.map(lambda x, s: (x.shape, s), st, specs)
    assert jax.tree.structure(zipped) is not None
