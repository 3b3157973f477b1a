"""Multi-chip fused training: env-sharded shard_map over the mesh.

This is the rebuild's distributed-communication layer — the subsystem the
reference simply does not have (SURVEY.md §2.3: no NCCL/MPI/Gloo, not even
multiprocessing).  Design per the TPU sharding playbook:

  * 1-D mesh, axis "env": the env batch, replay buffer, observations, and
    exploration-noise state shard along their leading (env/capacity) dim —
    one shard per chip, zero cross-chip traffic on the sim/replay path.
  * Network params + optimizer state are replicated; each chip computes
    gradients on its local replay batch and ``pmean``s them (ICI psum), so
    replicas stay bit-identical.
  * RNG: a replicated key, decorrelated per chip by folding in the axis
    index inside the mapped function (each agent's make_segment).
  * The per-chip program is the *same* fused K-step segment used single-chip
    — multi-chip is a pure sharding annotation change, the XLA way.

The layer is agent-generic: :func:`state_specs` partitions ANY flax-struct
agent state given the names of its env-sharded fields, and
:func:`make_distributed` wraps any per-chip ``state → (state, metrics)``
segment.  Every agent (DDPG, NAF, DQN, LRPG) exposes ``--num-devices`` on
top of it.
"""

from __future__ import annotations

import dataclasses

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cartpoleplusplus_tpu.replay import ReplayState


def state_specs(st, axis: str, sharded_fields: tuple[str, ...]):
    """PartitionSpec tree for an agent-state dataclass.

    ``sharded_fields``: names of the state's fields whose arrays shard along
    their leading (env / replay-capacity) dim.  Everything else — params,
    optimizer state, RNG key, step counters — replicates.  ReplayState fields
    keep their ``cursor``/``size`` scalars replicated (every shard writes the
    same number of local transitions per step, so the scalars evolve
    identically on all chips).

    Field-name granularity (rather than guessing from array shapes) is
    deliberate: a hidden layer of width ``num_envs`` would silently shard a
    weight matrix under any shape-based rule.
    """
    repl = lambda tree: jax.tree.map(lambda _: P(), tree)

    def shard_tree(v):
        if isinstance(v, ReplayState):
            return v.replace(
                s1=P(axis), action=P(axis), reward=P(axis),
                # s2 is a (0,) placeholder in s2-free mode — replicate it;
                # same for priority when the buffer is uniform-only.
                s2=P(axis) if v.s2.size else P(),
                # priority may be None on hand-built states (buffer.create
                # always sets it).  The spec must then be None TOO: None is
                # an empty pytree node, so a P() here would make the spec
                # tree's structure diverge from the state's and every
                # tree_map over (state, specs) — shard_state, shard_map —
                # would raise.
                priority=(None if v.priority is None
                          else P(axis) if v.priority.size else P()),
                terminal=P(axis), cursor=P(), size=P(),
            )
        return jax.tree.map(
            lambda x: P(axis) if getattr(x, "ndim", 0) >= 1 else P(), v
        )

    out = {}
    for f in dataclasses.fields(st):
        v = getattr(st, f.name)
        out[f.name] = shard_tree(v) if f.name in sharded_fields else repl(v)
    return type(st)(**out)


def make_distributed(
    mesh: Mesh,
    per_chip_segment,
    st_example,
    sharded_fields: tuple[str, ...],
    metric_keys: tuple[str, ...],
):
    """shard_map any per-chip fused segment over the mesh.

    ``per_chip_segment``: state → (state, {metric: scalar}) built with
    ``axis_name=mesh.axis_names[0]`` so it pmeans its gradients/metrics and
    decorrelates its RNG stream per chip.  ``st_example`` provides the state
    structure (host-built GLOBAL state: env/replay sized for the whole mesh).

    Returns ``(segment, shard_state)``: the jitted donated segment and a
    placement function mapping a global host state onto the mesh.
    """
    axis = mesh.axis_names[0]
    specs = state_specs(st_example, axis, sharded_fields)
    out_specs = (specs, {k: P() for k in metric_keys})
    mapped = jax.shard_map(
        per_chip_segment,
        mesh=mesh,
        in_specs=(specs,),
        out_specs=out_specs,
        check_vma=False,
    )
    segment = jax.jit(mapped, donate_argnums=0)

    def shard_state(st):
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), st, specs
        )

    return segment, shard_state


# ---------------------------------------------------------------------------
# DDPG convenience wrappers (the flagship multi-chip path; kept for the
# driver's dryrun and agents/ddpg.py --num-devices).
# ---------------------------------------------------------------------------

DDPG_SHARDED_FIELDS = ("replay", "env_states", "obs", "ou_noise")
DDPG_METRIC_KEYS = (
    "critic_loss", "actor_loss", "reward", "done_frac", "double_reset_frac"
)


def make_distributed_segment(
    mesh: Mesh,
    local_venv,
    actor,
    critic,
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
    ou_sigma_min: float | None = None,
    ou_decay_steps: int = 0,
    reward_scale: float = 1.0,
    aug_shift: int = 0,
    twin_critic: bool = False,
    policy_delay: int = 1,
    target_noise: float = 0.0,
    target_noise_clip: float = 0.5,
    per_alpha: float | None = None,
    per_beta0: float = 0.4,
    per_total_steps: int = 1,
    per_eps: float = 1e-2,
    n_step: int = 1,
):
    """Jitted multi-chip DDPG segment: sharded state → (state, metrics).

    ``local_venv`` is sized for ONE chip's env shard (global_envs / n_chips);
    ``batch_size`` is the per-chip replay batch (global batch = B × chips).
    Returns (build, shard_state): ``build(st_example)`` → jitted segment.
    """
    from cartpoleplusplus_tpu.agents import ddpg as ddpg_mod

    axis = mesh.axis_names[0]
    per_chip_segment = ddpg_mod.make_segment(
        local_venv, actor, critic, actor_tx, critic_tx,
        gamma=gamma, tau=tau, batch_size=batch_size,
        warmup_steps=warmup_steps, steps_per_segment=steps_per_segment,
        ou_theta=ou_theta, ou_sigma=ou_sigma,
        ou_sigma_min=ou_sigma_min, ou_decay_steps=ou_decay_steps,
        reward_scale=reward_scale,
        aug_shift=aug_shift, twin_critic=twin_critic,
        policy_delay=policy_delay, target_noise=target_noise,
        target_noise_clip=target_noise_clip,
        per_alpha=per_alpha, per_beta0=per_beta0,
        per_total_steps=per_total_steps, per_eps=per_eps, n_step=n_step,
        axis_name=axis,
    )

    def build(st_example):
        segment, _ = make_distributed(
            mesh, per_chip_segment, st_example,
            DDPG_SHARDED_FIELDS, DDPG_METRIC_KEYS,
        )
        return segment

    def shard_state(st):
        specs = state_specs(st, axis, DDPG_SHARDED_FIELDS)
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), st, specs
        )

    return build, shard_state


def global_ddpg_state(
    config, global_envs: int, replay_capacity: int,
    actor, critic, actor_tx, critic_tx, seed: int = 0, num_devices: int = 1,
):
    """Global DDPG state with env/replay sized for the WHOLE mesh.

    Mirrors agents.ddpg.init_state with explicit sizes; build once, then
    place with ``shard_state``.  ``num_devices`` sizes the s2-free replay
    block for the per-chip shard (see agents.common.replay_block).
    """
    from cartpoleplusplus_tpu.agents import common
    from cartpoleplusplus_tpu.agents import ddpg as ddpg_mod

    opts = type("O", (), {
        "seed": seed,
        "replay_capacity": replay_capacity,
        "num_devices": num_devices,
    })()
    venv = common.make_venv(config, global_envs)
    return ddpg_mod.init_state(opts, config, venv, actor, critic, actor_tx, critic_tx)
