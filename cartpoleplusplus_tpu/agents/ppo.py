"""PPO agent — clipped-surrogate on-policy actor-critic, continuous actions.

Beyond reference parity: the upstream zoo's only on-policy agent is plain
REINFORCE (lrpg_cartpole.py, SURVEY.md §2.1).  PPO (Schulman et al. 2017)
is its modern successor — GAE(λ) advantages against a learned V(s) baseline,
a clipped importance-ratio surrogate, and multiple minibatch epochs per
rollout — and reuses this framework's encoder / vector-env / metrics /
checkpoint stack unchanged (the same GaussianActor as SAC, tanh-squashed).

TPU-first shape: ONE jitted program per update — a ``lax.scan`` rollout of
``--rollout-steps`` auto-resetting vectorized env steps (physics + render
fused in, same step path as the off-policy agents), a reverse-scan GAE pass,
then ``--ppo-epochs`` × ``--ppo-minibatches`` clipped updates as nested
scans over a device-resident permutation.  Nothing leaves the chip between
updates but scalar metrics.

CLI: ``python -m cartpoleplusplus_tpu.agents.ppo --num-train-batches …``
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import optax
from flax import struct

from cartpoleplusplus_tpu.agents import common
from cartpoleplusplus_tpu.env.cartpole import EnvState
from cartpoleplusplus_tpu.env.config import config_from_opts
from cartpoleplusplus_tpu.env.vector import VectorCartpole, resolve_obs
from cartpoleplusplus_tpu.models import GaussianActor, ValueNetwork
from cartpoleplusplus_tpu.utils import checkpoint as ckpt_mod
from cartpoleplusplus_tpu.utils.metrics import MetricsLogger


@struct.dataclass
class PPOState:
    """Everything the fused loop carries (donated across updates)."""

    params: dict            # {"actor": …, "value": …} under one optimizer
    opt_state: optax.OptState
    env_states: EnvState
    obs: jnp.ndarray        # acting observation (E, …)
    rng: jax.Array
    update: jnp.ndarray     # () int32


def add_ppo_opts(parser):
    parser.add_argument("--rollout-steps", type=int, default=128,
                        help="vectorized env steps per update (T); the "
                             "on-policy batch is T × num-envs transitions")
    parser.add_argument("--ppo-epochs", type=int, default=4)
    parser.add_argument("--ppo-minibatches", type=int, default=4,
                        help="minibatches per epoch (must divide T × E)")
    parser.add_argument("--ppo-clip", type=float, default=0.2,
                        help="importance-ratio clip ε")
    parser.add_argument("--gae-lambda", type=float, default=0.95)
    parser.add_argument("--entropy-coef", type=float, default=0.003,
                        help="entropy bonus weight (sample estimate −log π)")
    parser.add_argument("--value-coef", type=float, default=0.5)
    parser.add_argument("--reward-scale", type=float, default=1.0,
                        help="scale rewards before GAE (advantages are "
                             "whitened, so this mainly conditions the "
                             "value regression)")
    parser.add_argument("--grad-clip", type=float, default=0.5,
                        help="global-norm gradient clip (0 = off)")
    parser.add_argument("--num-devices", type=int, default=1,
                        help="shard envs over this many devices (shard_map "
                             "data parallelism; params replicate, grads "
                             "pmean over ICI)")
    common.add_lr_schedule_opt(parser)


def tanh_gaussian_logp(mu, log_std, u):
    """log π(tanh(u)|s) for a tanh-squashed Gaussian, from the PRE-squash u.

    PPO stores u in the rollout so the ratio's new-params log-prob never
    needs atanh (unstable at the saturated tails).  Same stable
    change-of-variables identity as agents/sac.py::sample_action.
    """
    eps = (u - mu) * jnp.exp(-log_std)
    logp = -0.5 * (eps**2 + 2.0 * log_std + jnp.log(2.0 * jnp.pi)).sum(-1)
    return logp - (2.0 * (jnp.log(2.0) - u - jax.nn.softplus(-2.0 * u))).sum(-1)


def greedy_act(actor: GaussianActor):
    def act(params, obs):
        mu, _ = actor.apply(params, obs)
        return jnp.tanh(mu)

    return act


def make_train_step(
    venv: VectorCartpole,
    actor: GaussianActor,
    value: ValueNetwork,
    tx,
    opts,
    axis_name: str | None = None,
):
    """One fused PPO update: rollout T → GAE → epochs × minibatch steps."""
    T = opts.rollout_steps
    E = venv.num_envs
    M = opts.ppo_minibatches
    if (T * E) % M:
        raise SystemExit("--ppo-minibatches must divide rollout-steps × envs")
    mb = (T * E) // M
    gamma, lam = opts.gamma, opts.gae_lambda
    clip, v_coef, ent_coef = opts.ppo_clip, opts.value_coef, opts.entropy_coef
    rscale = opts.reward_scale

    def loss_fn(params, obs_b, u_b, logp_old_b, adv_b, ret_b):
        mu, log_std = actor.apply(params["actor"], obs_b)
        logp = tanh_gaussian_logp(mu, log_std, u_b)
        ratio = jnp.exp(logp - logp_old_b)
        s1 = ratio * adv_b
        s2 = jnp.clip(ratio, 1.0 - clip, 1.0 + clip) * adv_b
        pg_loss = -jnp.minimum(s1, s2).mean()
        v = value.apply(params["value"], obs_b)
        v_loss = 0.5 * jnp.mean((v - ret_b) ** 2)
        entropy = -logp.mean()  # sample estimate (exact tanh entropy has no
        # closed form; −log π is the standard unbiased one)
        loss = pg_loss + v_coef * v_loss - ent_coef * entropy
        clip_frac = jnp.mean((jnp.abs(ratio - 1.0) > clip).astype(jnp.float32))
        approx_kl = jnp.mean(logp_old_b - logp)
        return loss, (pg_loss, v_loss, entropy, clip_frac, approx_kl)

    def train_step(ps: PPOState):
        rng = ps.rng
        if axis_name is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        rng, k_reset, k_roll, k_perm = jax.random.split(rng, 4)
        reset_pool = venv.reset(k_reset)

        def rollout_body(carry, k):
            states, obs = carry
            mu, log_std = actor.apply(ps.params["actor"], obs)
            u = mu + jnp.exp(log_std) * jax.random.normal(k, mu.shape)
            logp = tanh_gaussian_logp(mu, log_std, u)
            v = value.apply(ps.params["value"], obs)
            nstates, nobs_raw, reward, done = venv.step_lazy(
                states, jnp.tanh(u), reset_pool
            )
            nobs = resolve_obs(done, reset_pool[1], nobs_raw)
            out = (obs, u, logp, v, reward, done)
            return (nstates, nobs), out

        keys = jax.random.split(k_roll, T)
        (env_states, obs_last), (obs_t, u_t, logp_t, v_t, rew_t, done_t) = (
            jax.lax.scan(rollout_body, (ps.env_states, ps.obs), keys)
        )
        v_last = value.apply(ps.params["value"], obs_last)

        # GAE(λ) with termination masking (time-limit dones bootstrap like
        # terminals — the env folds max-episode-len into done, matching the
        # reference's semantics and the off-policy agents here).
        rew_t = rew_t * rscale
        not_done = 1.0 - done_t.astype(jnp.float32)

        def gae_body(adv_next, x):
            r, v, nd, v_next = x
            delta = r + gamma * v_next * nd - v
            adv = delta + gamma * lam * nd * adv_next
            return adv, adv

        v_next_t = jnp.concatenate([v_t[1:], v_last[None]], axis=0)
        _, adv_t = jax.lax.scan(
            gae_body, jnp.zeros_like(v_last),
            (rew_t, v_t, not_done, v_next_t), reverse=True,
        )
        ret_t = adv_t + v_t

        # Flatten and whiten advantages over the whole on-policy batch.
        flat = lambda x: x.reshape((T * E,) + x.shape[2:])
        obs_b, u_b, logp_b = flat(obs_t), flat(u_t), flat(logp_t)
        adv_b, ret_b = flat(adv_t), flat(ret_t)
        if axis_name is not None:
            mean = jax.lax.pmean(adv_b.mean(), axis_name)
            var = jax.lax.pmean(((adv_b - mean) ** 2).mean(), axis_name)
        else:
            mean, var = adv_b.mean(), adv_b.var()
        adv_b = (adv_b - mean) * jax.lax.rsqrt(var + 1e-8)

        def epoch_body(carry, k):
            params, opt_state = carry
            perm = jax.random.permutation(k, T * E)

            def mb_body(carry2, idx):
                params, opt_state = carry2
                batch = tuple(x[idx] for x in (obs_b, u_b, logp_b, adv_b, ret_b))
                (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, *batch
                )
                if axis_name is not None:
                    grads = jax.lax.pmean(grads, axis_name)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (loss,) + aux

            return jax.lax.scan(mb_body, carry, perm.reshape(M, mb))

        epoch_keys = jax.random.split(k_perm, opts.ppo_epochs)
        (params, opt_state), stats = jax.lax.scan(
            epoch_body, (ps.params, ps.opt_state), epoch_keys
        )
        loss, pg_loss, v_loss, entropy, clip_frac, approx_kl = (
            s[-1, -1] for s in stats  # last minibatch of the last epoch
        )
        metrics = {
            "loss": loss, "pg_loss": pg_loss, "v_loss": v_loss,
            "entropy": entropy, "clip_frac": clip_frac,
            "approx_kl": approx_kl,
            "mean_reward": (rew_t / rscale).mean(),
            "done_frac": done_t.astype(jnp.float32).mean(),
        }
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
            rng = jax.lax.all_gather(rng, axis_name, axis=0)[0]
        return (
            PPOState(params=params, opt_state=opt_state,
                     env_states=env_states, obs=obs_last, rng=rng,
                     update=ps.update + 1),
            metrics,
        )

    return train_step


PPO_SHARDED_FIELDS = ("env_states", "obs")
PPO_METRIC_KEYS = ("loss", "pg_loss", "v_loss", "entropy", "clip_frac",
                   "approx_kl", "mean_reward", "done_frac")


def train(opts) -> float:
    """Full training run; returns final eval mean episode length."""
    config = config_from_opts(opts, discrete_actions=False)
    common.probe_raster_or_downgrade(config, opts)
    venv_kw = dict(
        pallas_render=getattr(opts, "pallas_render", False),
        pallas_physics=getattr(opts, "pallas_physics", False),
        render_raster=getattr(opts, "render_raster", None),
    )
    venv = common.make_venv(config, opts.num_envs, **venv_kw)
    eval_venv = common.make_venv(config, opts.num_eval)
    net_kw = dict(
        use_raw_pixels=config.use_raw_pixels,
        pixel_encoder=opts.pixel_encoder,
        pixel_pool=opts.pixel_pool,
        height=config.obs_height, width=config.obs_width,
        hidden=tuple(opts.hidden),
    )
    actor = GaussianActor(action_dim=2, **net_kw)
    value = ValueNetwork(**net_kw)
    logger = MetricsLogger(opts.metrics_jsonl, tb_dir=getattr(opts, "tb_dir", None))

    rng = jax.random.PRNGKey(opts.seed)
    rng, k_a, k_v, k_env = jax.random.split(rng, 4)
    dummy_obs = jnp.zeros((1,) + config.obs_shape,
                          jnp.uint8 if config.use_raw_pixels else jnp.float32)
    params = {"actor": actor.init(k_a, dummy_obs),
              "value": value.init(k_v, dummy_obs)}
    lr = opts.learning_rate
    if getattr(opts, "lr_schedule", "const") == "cosine":
        # One optimizer step per minibatch (make_lr's step count is the
        # off-policy agents' segments × steps; PPO's is epochs × minibatches).
        total = opts.num_train_batches * opts.ppo_epochs * opts.ppo_minibatches
        lr = optax.cosine_decay_schedule(lr, max(total, 1), alpha=0.02)
    tx = optax.adam(lr)
    if opts.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(opts.grad_clip), tx)
    env_states, obs = venv.reset(k_env)
    ps = PPOState(
        params=params, opt_state=tx.init(params),
        env_states=env_states, obs=obs, rng=rng,
        update=jnp.zeros((), jnp.int32),
    )

    restored = None
    multiproc = getattr(opts, "num_processes", 1) > 1
    if opts.ckpt_dir and not multiproc:
        ps, restored = common.restore_for_startup(opts, ps)
        if restored is not None:
            logger.log("restore", step=restored)
    if opts.eval_only:
        return common.run_eval_only(opts, config, logger, restored,
                                    eval_venv, greedy_act(actor),
                                    ps.params["actor"])

    if getattr(opts, "num_devices", 1) > 1:
        from cartpoleplusplus_tpu.parallel import make_distributed, make_mesh

        if opts.num_envs % opts.num_devices:
            raise SystemExit("--num-envs must be divisible by --num-devices")
        mesh = make_mesh(opts.num_devices)
        local_venv = common.make_venv(
            config, opts.num_envs // opts.num_devices, **venv_kw
        )
        per_chip = make_train_step(
            local_venv, actor, value, tx, opts, axis_name=mesh.axis_names[0]
        )
        train_step, shard_state = make_distributed(
            mesh, per_chip, ps, PPO_SHARDED_FIELDS, PPO_METRIC_KEYS
        )
        ps = shard_state(ps)
        if opts.ckpt_dir and multiproc:
            # Rank-sharded resume AFTER mesh placement (see agents/ddpg.py
            # and utils/checkpoint.restore_latest_sharded).  PPO's resume
            # point is the in-state ``update`` counter (replicated), read
            # below as ``start``.
            ps, restored = ckpt_mod.restore_latest_sharded(opts.ckpt_dir, ps)
            if restored is not None:
                logger.log("restore", step=restored)
    else:
        train_step = jax.jit(
            make_train_step(venv, actor, value, tx, opts), donate_argnums=0
        )
    eval_fn = jax.jit(
        lambda p, k: common.eval_rollout(eval_venv, greedy_act(actor), p, k)
    )

    rng = jax.random.PRNGKey(opts.seed + 1)  # ts.rng's buffer is donated
    final_eval = 0.0
    best_keeper = common.BestCkptKeeper(opts, multiproc)
    start = int(ps.update)
    for i in range(start, opts.num_train_batches):
        ps, metrics = train_step(ps)
        if (i + 1) % max(opts.eval_freq, 1) == 0 or i + 1 == opts.num_train_batches:
            rng, k_eval = jax.random.split(rng)
            # Multi-process: fetch the identical local replica for the
            # process-local eval jit (see agents/ddpg.py).
            eval_params = (common.host_fetch(ps.params["actor"])
                           if multiproc else ps.params["actor"])
            elen, erew = eval_fn(eval_params, k_eval)
            final_eval = float(elen)
            best_keeper.update(i + 1, final_eval, ps)
            logger.log(
                "train",
                update=i + 1,
                env_steps=(i + 1) * opts.rollout_steps * opts.num_envs,
                **{k: float(metrics[k]) for k in PPO_METRIC_KEYS},
                eval_ep_len=float(elen),
                eval_ep_rew=float(erew),
            )
        if opts.ckpt_dir and (i + 1) % max(opts.ckpt_freq, 1) == 0:
            ckpt_mod.save(opts.ckpt_dir, i + 1, ps)
    if opts.ckpt_dir:
        # Clamp like dqn/sac: a re-run of an already-finished training must
        # not rewrite an old-step filename with newer-step state.
        ckpt_mod.save(opts.ckpt_dir, max(opts.num_train_batches, start), ps)
    # Ranks > 0 have event-log/export flags cleared — only fetch the
    # params D2H when this rank will actually use them.
    needs_tail = bool(opts.event_log_out
                      or getattr(opts, "export_policy", None))
    tail_params = (common.host_fetch(ps.params["actor"])
                   if multiproc and needs_tail else ps.params["actor"])
    if opts.event_log_out:
        lens = common.record_eval_episodes(
            config, greedy_act(actor), tail_params,
            opts.event_log_out, seed=opts.seed,
            raster=getattr(opts, "render_raster", False),
        )
        logger.log("event_log", episodes=len(lens), lengths=lens)
    common.maybe_export_policy(opts, config, greedy_act(actor),
                               tail_params, logger)
    logger.close()
    return final_eval


def main(argv=None):
    parser = common.make_parser(
        "PPO agent on cartpole++ (beyond-parity on-policy actor-critic)"
    )
    add_ppo_opts(parser)
    opts = parser.parse_args(argv)
    common.maybe_init_multihost(opts, supported=True)
    print(f"OPTS {vars(opts)}", file=sys.stderr)
    train(opts)


if __name__ == "__main__":
    # Re-enter through the canonical module (flax dataclass pytree identity;
    # see agents/lrpg.py).
    from cartpoleplusplus_tpu.agents.ppo import main as _main

    _main()
