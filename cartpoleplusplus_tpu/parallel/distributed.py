"""Multi-chip fused DDPG training: env-sharded shard_map over the mesh.

This is the rebuild's distributed-communication layer — the subsystem the
reference simply does not have (SURVEY.md §2.3: no NCCL/MPI/Gloo, not even
multiprocessing).  Design per the TPU sharding playbook:

  * 1-D mesh, axis "env": the env batch, replay buffer, observations, and
    OU-noise state shard along their leading (env/capacity) dim — one shard
    per chip, zero cross-chip traffic on the sim/replay path.
  * Network params + optimizer state are replicated; each chip computes
    gradients on its local replay batch and ``pmean``s them (ICI psum), so
    replicas stay bit-identical.
  * RNG: a replicated key, decorrelated per chip by folding in the axis
    index inside the mapped function (agents/ddpg.py make_segment).
  * The per-chip program is the *same* fused K-step segment used single-chip
    — multi-chip is a pure sharding annotation change, the XLA way.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cartpoleplusplus_tpu.agents import ddpg as ddpg_mod
from cartpoleplusplus_tpu.agents.ddpg import DDPGState
from cartpoleplusplus_tpu.env.vector import VectorCartpole
from cartpoleplusplus_tpu.models import Actor, Critic
from cartpoleplusplus_tpu.parallel.mesh import ENV_AXIS


def _state_specs(st: DDPGState, axis: str) -> DDPGState:
    """PartitionSpec tree for a DDPGState: params replicated, env data sharded.

    Replay cursor/size and the step counter stay replicated — every shard
    writes the same number of local transitions per step, so the scalars
    evolve identically on all chips.
    """
    repl = lambda tree: jax.tree.map(lambda _: P(), tree)
    shard = lambda tree: jax.tree.map(
        lambda x: P(axis) if getattr(x, "ndim", 0) >= 1 else P(), tree
    )
    return DDPGState(
        actor_params=repl(st.actor_params),
        critic_params=repl(st.critic_params),
        target_actor_params=repl(st.target_actor_params),
        target_critic_params=repl(st.target_critic_params),
        actor_opt=repl(st.actor_opt),
        critic_opt=repl(st.critic_opt),
        replay=st.replay.replace(
            s1=P(axis), action=P(axis), reward=P(axis), s2=P(axis),
            terminal=P(axis), cursor=P(), size=P(),
        ),
        env_states=shard(st.env_states),
        obs=P(axis),
        ou_noise=P(axis),
        rng=P(),
        env_steps=P(),
    )


def make_distributed_segment(
    mesh: Mesh,
    local_venv: VectorCartpole,
    actor: Actor,
    critic: Critic,
    actor_tx,
    critic_tx,
    *,
    gamma: float = 0.99,
    tau: float = 0.005,
    batch_size: int = 128,
    warmup_steps: int = 20,
    steps_per_segment: int = 25,
    ou_theta: float = 0.15,
    ou_sigma: float = 0.2,
    reward_scale: float = 1.0,
):
    """Jitted multi-chip segment: DDPGState (sharded) → (DDPGState, metrics).

    ``local_venv`` is sized for ONE chip's env shard (global_envs / n_chips);
    ``batch_size`` is the per-chip replay batch (global batch = B × chips).
    Returns (segment_fn, state_sharding_fn) — the latter maps a host-built
    global DDPGState to its mesh sharding.
    """
    axis = mesh.axis_names[0]
    per_chip_segment = ddpg_mod.make_segment(
        local_venv, actor, critic, actor_tx, critic_tx,
        gamma=gamma, tau=tau, batch_size=batch_size,
        warmup_steps=warmup_steps, steps_per_segment=steps_per_segment,
        ou_theta=ou_theta, ou_sigma=ou_sigma, reward_scale=reward_scale,
        axis_name=axis,
    )

    def specs_for(st: DDPGState) -> DDPGState:
        return _state_specs(st, axis)

    def build(st_example: DDPGState):
        specs = specs_for(st_example)
        metric_keys = ("critic_loss", "actor_loss", "reward", "done_frac")
        out_specs = (specs, {k: P() for k in metric_keys})
        mapped = jax.shard_map(
            per_chip_segment,
            mesh=mesh,
            in_specs=(specs,),
            out_specs=out_specs,
            check_vma=False,
        )
        return jax.jit(mapped, donate_argnums=0)

    def shard_state(st: DDPGState) -> DDPGState:
        specs = specs_for(st)
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), st, specs
        )

    return build, shard_state


def global_ddpg_state(
    config, global_envs: int, replay_capacity: int,
    actor, critic, actor_tx, critic_tx, seed: int = 0,
) -> DDPGState:
    """Global state with env/replay sized for the WHOLE mesh.

    Mirrors agents.ddpg.init_state with explicit sizes; build once, then
    place with ``shard_state``.
    """
    from cartpoleplusplus_tpu.agents import common

    opts = type("O", (), {"seed": seed, "replay_capacity": replay_capacity})()
    venv = common.make_venv(config, global_envs)
    return ddpg_mod.init_state(opts, config, venv, actor, critic, actor_tx, critic_tx)
