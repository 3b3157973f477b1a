"""Likelihood-ratio policy gradient (REINFORCE) agent — discrete actions.

Rebuild of the reference's ``lrpg_cartpole.py`` (~200 LoC): a softmax policy
MLP over the 5 discrete actions, trained per-episode on ∇log π(a|s) ·
discounted-return (reference ~L100-160, SURVEY.md §3.4).

TPU-first redesign: instead of one Python-driven episode at a time, a whole
batch of episodes rolls out inside a single jitted ``lax.scan`` — policy
forward, env physics, and the PG update are one compiled program; nothing
leaves the device between updates.

CLI: ``python -m cartpoleplusplus_tpu.agents.lrpg --num-train-batches …``
(reference: ``python lrpg_cartpole.py``).
"""

from __future__ import annotations

import sys
from functools import partial

import jax
import jax.numpy as jnp
import optax
from flax import struct

from cartpoleplusplus_tpu.agents import common
from cartpoleplusplus_tpu.env import cartpole as cartpole_mod
from cartpoleplusplus_tpu.env.config import (
    NUM_DISCRETE_ACTIONS,
    CartpoleConfig,
    config_from_opts,
)
from cartpoleplusplus_tpu.env.vector import VectorCartpole
from cartpoleplusplus_tpu.models import DiscretePolicy
from cartpoleplusplus_tpu.utils import checkpoint as ckpt_mod
from cartpoleplusplus_tpu.utils.metrics import MetricsLogger


@struct.dataclass
class TrainState:
    params: dict
    opt_state: optax.OptState
    rng: jax.Array
    update: jnp.ndarray  # () int32


def rollout_batch(venv: VectorCartpole, policy: DiscretePolicy, params, rng):
    """Roll one episode per env slot under the current stochastic policy.

    Returns per-step (obs, action, reward, valid) stacked over T =
    max_episode_len; ``valid`` masks steps after each env's episode ended
    (the reference rolls a single episode of natural length; here length is
    padded to the cap so shapes stay static — same data, masked).
    """
    k_reset, k_steps = jax.random.split(rng)
    states, obs = venv.reset(k_reset)
    alive0 = jnp.ones((venv.num_envs,), bool)

    def body(carry, k):
        states, obs, alive = carry
        logits = policy.apply(params, obs)
        action = jax.random.categorical(k, logits)
        nstates, nobs, reward, done = cartpole_mod.step_batched(
            venv.config, venv.scene, states, action, venv.observe_fn,
            venv.observe_batched_fn, venv.physics_fn, venv.sim_fn,
        )
        out = (obs, action, reward, alive)
        return (nstates, nobs, alive & ~done), out

    keys = jax.random.split(k_steps, venv.config.max_episode_len)
    _, (obs_t, act_t, rew_t, valid_t) = jax.lax.scan(
        body, (states, obs, alive0), keys
    )
    return obs_t, act_t, rew_t, valid_t  # each (T, E, ...)


def discounted_returns(rewards: jnp.ndarray, valid: jnp.ndarray, gamma: float):
    """Reward-to-go per step: Rₜ = Σ_{k≥t} γ^{k-t} r_k (reference ~L130-150)."""
    rewards = rewards * valid

    def body(carry, r):
        g = r + gamma * carry
        return g, g

    _, returns = jax.lax.scan(body, jnp.zeros_like(rewards[0]), rewards[::-1])
    return returns[::-1]


def make_train_step(
    venv: VectorCartpole,
    policy: DiscretePolicy,
    tx,
    gamma: float,
    axis_name: str | None = None,
):
    """One fused update: batched rollout → whitened returns → PG step.

    ``axis_name``: under ``shard_map`` (parallel/distributed.py) each device
    rolls out its own env batch (decorrelated RNG via axis-index fold-in) and
    gradients/metrics are pmean'd over ICI — on-policy data parallelism with
    fully replicated state.
    """

    def loss_fn(params, obs_t, act_t, ret_t, valid_t):
        T, E = act_t.shape
        logits = policy.apply(params, obs_t.reshape((T * E,) + obs_t.shape[2:]))
        logp = jax.nn.log_softmax(logits)[jnp.arange(T * E), act_t.reshape(-1)]
        w = valid_t.reshape(-1).astype(jnp.float32)
        # Whiten returns over valid steps (variance reduction; the reference
        # normalizes per-episode advantages similarly).
        r = ret_t.reshape(-1)
        mean = jnp.sum(r * w) / jnp.maximum(jnp.sum(w), 1.0)
        var = jnp.sum(w * (r - mean) ** 2) / jnp.maximum(jnp.sum(w), 1.0)
        adv = (r - mean) * jax.lax.rsqrt(var + 1e-6)
        return -jnp.sum(logp * adv * w) / jnp.maximum(jnp.sum(w), 1.0)

    def train_step(ts: TrainState):
        rng = ts.rng
        if axis_name is not None:
            # Replicated key in; decorrelate this device's rollouts.
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        rng, k_roll = jax.random.split(rng)
        obs_t, act_t, rew_t, valid_t = rollout_batch(venv, policy, ts.params, k_roll)
        ret_t = discounted_returns(rew_t, valid_t.astype(jnp.float32), gamma)
        loss, grads = jax.value_and_grad(loss_fn)(
            ts.params, obs_t, act_t, ret_t, valid_t
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        ep_len = jnp.sum(valid_t.astype(jnp.float32)) / valid_t.shape[1]
        ep_rew = jnp.sum(rew_t * valid_t) / valid_t.shape[1]
        metrics = {"loss": loss, "ep_len": ep_len, "ep_rew": ep_rew}
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
            # Re-replicate the carried rng (devices diverged via fold_in).
            rng = jax.lax.all_gather(rng, axis_name, axis=0)[0]
        return (
            TrainState(params=params, opt_state=opt_state, rng=rng,
                       update=ts.update + 1),
            metrics,
        )

    return train_step


LRPG_SHARDED_FIELDS: tuple = ()  # on-policy: every field replicates
LRPG_METRIC_KEYS = ("loss", "ep_len", "ep_rew")


def greedy_act(policy: DiscretePolicy):
    def act(params, obs):
        return jnp.argmax(policy.apply(params, obs), axis=-1)

    return act


def train(opts) -> float:
    """Full training run; returns final eval mean episode length."""
    config = config_from_opts(opts, discrete_actions=True)
    common.probe_raster_or_downgrade(config, opts)
    venv = common.make_venv(
        config, opts.num_envs,
        pallas_render=getattr(opts, "pallas_render", False),
        pallas_physics=getattr(opts, "pallas_physics", False),
        render_raster=getattr(opts, "render_raster", False),
    )
    eval_venv = common.make_venv(config, opts.num_eval)
    policy = DiscretePolicy(
        num_actions=NUM_DISCRETE_ACTIONS,
        use_raw_pixels=config.use_raw_pixels,
        pixel_encoder=opts.pixel_encoder,
        pixel_pool=opts.pixel_pool,
        height=config.obs_height, width=config.obs_width,
        hidden=tuple(opts.hidden),
    )
    logger = MetricsLogger(opts.metrics_jsonl, tb_dir=getattr(opts, "tb_dir", None))

    rng = jax.random.PRNGKey(opts.seed)
    rng, k_init = jax.random.split(rng)
    dummy_obs = jnp.zeros((1,) + config.obs_shape, jnp.float32)
    params = policy.init(k_init, dummy_obs)
    tx = optax.adam(opts.learning_rate)
    ts = TrainState(
        params=params,
        opt_state=tx.init(params),
        rng=rng,
        update=jnp.zeros((), jnp.int32),
    )

    restored = None
    multiproc = getattr(opts, "num_processes", 1) > 1
    if opts.ckpt_dir and not multiproc:
        ts, restored = common.restore_for_startup(opts, ts)
        if restored is not None:
            logger.log("restore", step=restored)
    if opts.eval_only:
        return common.run_eval_only(opts, config, logger, restored,
                                    eval_venv, greedy_act(policy), ts.params)

    if getattr(opts, "num_devices", 1) > 1:
        # On-policy multi-chip DP: each device rolls out its own env batch;
        # grads pmean over ICI; all state replicated (agent-generic layer).
        from cartpoleplusplus_tpu.parallel import make_distributed, make_mesh

        if opts.num_envs % opts.num_devices:
            raise SystemExit("--num-envs must be divisible by --num-devices")
        mesh = make_mesh(opts.num_devices)
        local_venv = common.make_venv(
            config, opts.num_envs // opts.num_devices,
            pallas_render=getattr(opts, "pallas_render", False),
            pallas_physics=getattr(opts, "pallas_physics", False),
            render_raster=getattr(opts, "render_raster", False),
        )
        per_chip = make_train_step(
            local_venv, policy, tx, opts.gamma, axis_name=mesh.axis_names[0]
        )
        train_step, shard_state = make_distributed(
            mesh, per_chip, ts, LRPG_SHARDED_FIELDS, LRPG_METRIC_KEYS
        )
        ts = shard_state(ts)
        if opts.ckpt_dir and multiproc:
            # Rank-sharded resume AFTER mesh placement (see agents/ddpg.py
            # and utils/checkpoint.restore_latest_sharded).
            ts, restored = ckpt_mod.restore_latest_sharded(opts.ckpt_dir, ts)
            if restored is not None:
                logger.log("restore", step=restored)
    else:
        train_step = jax.jit(
            make_train_step(venv, policy, tx, opts.gamma), donate_argnums=0
        )
    eval_fn = jax.jit(
        lambda p, k: common.eval_rollout(eval_venv, greedy_act(policy), p, k)
    )

    # Independent eval key: ts.rng's buffer is donated into train_step.
    rng = jax.random.PRNGKey(opts.seed + 1)
    final_eval = 0.0
    best_keeper = common.BestCkptKeeper(opts, multiproc)
    start = int(ts.update)
    for i in range(start, opts.num_train_batches):
        ts, metrics = train_step(ts)
        if (i + 1) % max(opts.eval_freq, 1) == 0 or i + 1 == opts.num_train_batches:
            rng, k_eval = jax.random.split(rng)
            # Multi-process: fetch the identical local replica for the
            # process-local eval jit (see agents/ddpg.py).
            eval_params = (common.host_fetch(ts.params)
                           if multiproc else ts.params)
            elen, erew = eval_fn(eval_params, k_eval)
            final_eval = float(elen)
            best_keeper.update(i + 1, final_eval, ts)
            logger.log(
                "train",
                update=i + 1,
                loss=float(metrics["loss"]),
                train_ep_len=float(metrics["ep_len"]),
                train_ep_rew=float(metrics["ep_rew"]),
                eval_ep_len=float(elen),
                eval_ep_rew=float(erew),
            )
        if opts.ckpt_dir and (i + 1) % max(opts.ckpt_freq, 1) == 0:
            ckpt_mod.save(opts.ckpt_dir, i + 1, ts)
    if opts.ckpt_dir:
        # Clamp like dqn/sac: a re-run of an already-finished training must
        # not rewrite an old-step filename with newer-step state.
        ckpt_mod.save(opts.ckpt_dir, max(opts.num_train_batches, start), ts)
    # Ranks > 0 have event-log/export flags cleared — only fetch the
    # params D2H when this rank will actually use them.
    needs_tail = bool(opts.event_log_out
                      or getattr(opts, "export_policy", None))
    tail_params = (common.host_fetch(ts.params)
                   if multiproc and needs_tail else ts.params)
    if opts.event_log_out:
        # Reference README-GIF evidence path (SURVEY.md §6): greedy eval
        # episodes → event log; GIFs via utils.event_log --gif-out.
        lens = common.record_eval_episodes(
            config, greedy_act(policy), tail_params,
            opts.event_log_out, seed=opts.seed,
            raster=getattr(opts, "render_raster", False),
        )
        logger.log("event_log", episodes=len(lens), lengths=lens)
    common.maybe_export_policy(opts, config, greedy_act(policy), tail_params,
                               logger)
    logger.close()
    return final_eval


def add_lrpg_opts(parser):
    parser.add_argument("--num-devices", type=int, default=1,
                        help="roll out env shards on this many devices "
                             "(shard_map data parallelism; grads pmean over "
                             "ICI). num-envs must divide evenly.")


def main(argv=None):
    parser = common.make_parser(
        "LRPG (REINFORCE) agent on cartpole++ (TPU rebuild of lrpg_cartpole.py)"
    )
    add_lrpg_opts(parser)
    opts = parser.parse_args(argv)
    common.maybe_init_multihost(opts, supported=True)
    print(f"OPTS {vars(opts)}", file=sys.stderr)  # reference prints opts at startup
    train(opts)


if __name__ == "__main__":
    # Re-enter through the canonical module: under ``python -m`` this file
    # executes as __main__, and flax dataclasses defined here would register
    # as DIFFERENT pytree node types than the ones other modules import
    # (breaking e.g. the distributed path's tree_maps).
    from cartpoleplusplus_tpu.agents.lrpg import main as _main

    _main()
