"""DDPG agent — continuous actions, on-device replay, fused step+train loop.

Rebuild of the reference's ``ddpg_cartpole.py`` (~340 LoC, SURVEY.md §2.1/
§3.2): deterministic actor µ(s) with tanh-bounded 2D action; critic Q(s,a)
with the action injected at a late FC layer; target copies with soft updates
``τ``; OU exploration noise; per-step cycle env.step → replay.add → sample →
critic MSE on ``r + γ·Q'(s2, µ'(s2))`` → actor ascent through the critic →
target soft-updates.

TPU-first redesign: the whole cycle — acting for E vectorized envs, physics,
replay write, replay sample, both network updates, target updates — is one
``lax.scan`` body compiled under a single jit; a training *segment* of K env
steps runs per Python call with donated state (no host↔device traffic except
scalar metrics).
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import optax
from flax import struct

from cartpoleplusplus_tpu.agents import common
from cartpoleplusplus_tpu.env import cartpole as cartpole_mod
from cartpoleplusplus_tpu.env.cartpole import EnvState
from cartpoleplusplus_tpu.env.config import config_from_opts
from cartpoleplusplus_tpu.env import vector as vector_mod
from cartpoleplusplus_tpu.env.vector import VectorCartpole
from cartpoleplusplus_tpu.models import Actor, Critic, soft_target_update
from cartpoleplusplus_tpu.replay import ReplayState
from cartpoleplusplus_tpu.replay import buffer as replay_mod
from cartpoleplusplus_tpu.utils import checkpoint as ckpt_mod
from cartpoleplusplus_tpu.utils.metrics import MetricsLogger
from cartpoleplusplus_tpu.utils.noise import ou_init, ou_step


@struct.dataclass
class DDPGState:
    """Everything the fused loop carries (donated across segments).

    The ``*_params`` fields hold full flax variable dicts ({'params': …,
    optionally 'batch_stats': …} when --use-batch-norm), mirroring NAFState.
    """

    actor_params: dict
    critic_params: dict
    target_actor_params: dict
    target_critic_params: dict
    actor_opt: optax.OptState
    critic_opt: optax.OptState
    replay: ReplayState
    env_states: EnvState
    obs: jnp.ndarray  # (E, *obs_shape) current observations
    ou_noise: jnp.ndarray  # (E, 2)
    rng: jax.Array
    env_steps: jnp.ndarray  # () int64-ish counter (int32 fine here)


def _apply_train(net, params, aux, *args):
    """Apply in train mode, threading batch stats functionally when BN is on.

    Rebuild of the reference's IS_TRAINING placeholder + batch-norm update
    ops (base_network.py:~L150-190): with --use-batch-norm the variables dict
    carries a 'batch_stats' collection that mutates on every train-mode
    forward; without it this is a plain apply.
    """
    variables = {**aux, "params": params}
    if "batch_stats" in aux:
        out, mutated = net.apply(variables, *args, train=True, mutable=["batch_stats"])
        return out, {**aux, **mutated}
    return net.apply(variables, *args, train=False), aux


def add_ddpg_opts(parser):
    common.add_per_opts(parser)  # --per* and --n-step (shared helper)
    parser.add_argument("--actor-learning-rate", type=float, default=1e-4)
    parser.add_argument("--critic-learning-rate", type=float, default=1e-3)
    parser.add_argument("--tau", type=float, default=0.005,
                        help="target soft-update rate")
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--replay-capacity", type=int, default=100000)
    parser.add_argument("--warmup-steps", type=int, default=20,
                        help="env steps before training starts")
    parser.add_argument("--steps-per-segment", type=int, default=25,
                        help="env steps fused into one jit call")
    parser.add_argument("--ou-theta", type=float, default=0.15)
    parser.add_argument("--ou-sigma", type=float, default=0.2)
    common.add_ou_anneal_opts(parser)
    parser.add_argument("--use-batch-norm", action="store_true")
    parser.add_argument("--reward-scale", type=float, default=1.0,
                        help="scale rewards in the TD target (stabilizes the "
                             "critic when returns approach 1/(1-gamma))")
    parser.add_argument("--grad-clip", type=float, default=0.0,
                        help="global-norm gradient clip (0 = off)")
    common.add_lr_schedule_opt(parser)
    parser.add_argument("--aug-shift", type=int, default=0,
                        help="pixel-only: DrQ-style random-shift data "
                             "augmentation — edge-pad frames by N px and "
                             "crop at a random offset per replay sample "
                             "(same shift across a sample's stacked frames). "
                             "The standard fix for DDPG-from-pixels "
                             "overfitting/plateaus; try 4.")
    parser.add_argument("--num-devices", type=int, default=1,
                        help="shard envs+replay over this many devices "
                             "(shard_map data parallelism; params replicate, "
                             "grads pmean over ICI). num-envs, replay "
                             "capacity, and num-eval must divide evenly.")
    # TD3-style stabilizers (Fujimoto et al. 2018) — opt-ins against the
    # documented pixel-DDPG seed collapse (VERDICT r2 weak #4).  All three
    # default OFF so plain DDPG stays the reference-parity behavior.
    parser.add_argument("--twin-critic", action="store_true",
                        help="TD3 clipped double-Q: two critics (stacked "
                             "params, vmapped apply), TD target bootstraps "
                             "min(Q1', Q2') — kills the critic over-"
                             "estimation spiral behind the instant-terminate "
                             "collapse mode")
    parser.add_argument("--policy-delay", type=int, default=1,
                        help="update the actor + all target nets every N "
                             "critic updates (TD3 uses 2)")
    parser.add_argument("--target-noise", type=float, default=0.0,
                        help="target-policy smoothing: clipped N(0, sigma) "
                             "added to the target action in the TD target "
                             "(TD3 uses 0.2)")
    parser.add_argument("--target-noise-clip", type=float, default=0.5)


def aug_random_shift(
    obs: jnp.ndarray, rng: jax.Array, pad: int, height: int, width: int
) -> jnp.ndarray:
    """DrQ-style random-shift augmentation for pixel replay batches.

    Edge-pad each frame by ``pad`` px and crop back at a per-sample random
    offset (the same shift applies to every stacked repeat/camera/channel
    plane of a sample, as in DrQ).  Runs on the (batch, repeats, planes·H·W)
    training batch only — tiny next to the env step — and regularizes the
    conv/dense encoder against pixel-exact overfitting, the standard remedy
    for DDPG-from-pixels plateaus.

    TPU note: the obvious ``vmap(dynamic_slice)`` crop lowers to a
    per-sample gather that measured ~40 ms/step at batch 256 (15× the whole
    rest of the segment).  Instead the shift is two one-hot MATMULS — crop =
    S_y · x · S_xᵀ with S the (H, H+2p) one-hot selection of rows
    [off, off+H) — which run on the MXU in bf16 (one-hot × uint8-scale
    values: exact) for ~128M MACs/batch, i.e. free.
    """
    b, r, f = obs.shape
    planes = f // (height * width)
    x = obs.reshape(b, r * planes, height, width)
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")
    off = jax.random.randint(rng, (b, 2), 0, 2 * pad + 1)

    dtype = jnp.bfloat16
    hp, wp = height + 2 * pad, width + 2 * pad
    # One-hot row/col selectors: S[b, i, j] = 1 iff j == i + off[b].
    sy = (
        jnp.arange(hp)[None, None, :]
        == jnp.arange(height)[None, :, None] + off[:, 0, None, None]
    ).astype(dtype)  # (B, H, H+2p)
    sx = (
        jnp.arange(wp)[None, None, :]
        == jnp.arange(width)[None, :, None] + off[:, 1, None, None]
    ).astype(dtype)  # (B, W, W+2p)
    y = jnp.einsum("bhj,bpjk->bphk", sy, x.astype(dtype))
    y = jnp.einsum("bwk,bphk->bphw", sx, y)
    return y.astype(obs.dtype).reshape(b, r, f)


def make_segment(
    venv: VectorCartpole,
    actor: Actor,
    critic: Critic,
    actor_tx,
    critic_tx,
    *,
    gamma: float,
    tau: float,
    batch_size: int,
    warmup_steps: int,
    steps_per_segment: int,
    ou_theta: float,
    ou_sigma: float,
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
    axis_name: str | None = None,
):
    """Build the jitted K-step fused train segment.

    ``axis_name``: when run under ``shard_map`` over a device mesh (see
    parallel/distributed.py), the name of the env-shard axis.  Gradients and
    metrics are ``pmean``-reduced across it (ICI collectives); per-device RNG
    streams are decorrelated by folding in the axis index.  The reference has
    no distributed story (SURVEY.md §2.3) — this is the TPU-native data-
    parallel design: env shards + replay shards per chip, replicated params,
    one psum per update.
    """
    per = per_alpha is not None

    def critic_loss_fn(c_params, c_aux, s1, a, y, iw):
        # iw: all-ones on the uniform path, the PER importance correction
        # otherwise.  The |TD| aux feeds the priority write-back (twin:
        # mean over the two critics' TDs).
        if twin_critic:
            # Stacked twin params (leading axis 2, see init_state) applied
            # via vmap-over-params: one fused MXU batch instead of two
            # sequential half-size critics.  Both regress the SAME clipped
            # double-Q target (TD3).
            q, new_aux = jax.vmap(
                lambda p, x: _apply_train(critic, p, x, s1, a)
            )(c_params, c_aux)
            # Mean over BOTH axes (canonical TD3 sums the two per-critic
            # MSEs, i.e. 2x this loss).  The constant factor is absorbed by
            # Adam's per-parameter normalization, so per-critic update scale
            # matches the single-critic branch at the same lr; it only
            # shifts the --grad-clip threshold.  Kept as mean deliberately —
            # the validated TD3 pixel recipe (BASELINE.md) was tuned here.
            td = q - y[None]
            return (jnp.mean(iw[None] * td**2),
                    (new_aux, jnp.mean(jnp.abs(td), axis=0)))
        q, new_aux = _apply_train(critic, c_params, c_aux, s1, a)
        td = q - y
        return jnp.mean(iw * td**2), (new_aux, jnp.abs(td))

    def actor_loss_fn(a_params, a_aux, critic_vars, s1):
        mu, new_aux = _apply_train(actor, a_params, a_aux, s1)
        if twin_critic:
            # Standard TD3: the actor ascends Q1 only.
            critic_vars = jax.tree.map(lambda x: x[0], critic_vars)
        return -jnp.mean(critic.apply(critic_vars, s1, mu)), new_aux

    # The learner bundle (params + opt states) is threaded through lax.cond
    # SEPARATELY from the big buffers (replay, env states, observations):
    # conditionals select over every carried leaf, so routing the whole
    # DDPGState through the cond would copy hundreds of MB of replay/obs per
    # step on the pixel path.
    def train_once(bundle, batch, iw, k_train, step):
        (actor_vars, critic_vars, target_a, target_c, aopt, copt) = bundle
        s1, a, r, s2, term = batch
        s1, s2 = replay_mod.decode_obs(s1), replay_mod.decode_obs(s2)
        k_aug, k_tn = jax.random.split(k_train)
        if aug_shift > 0 and venv.config.use_raw_pixels:
            # Augment at the dims the pipeline carries (post obs_pool).
            h, w = venv.config.obs_height, venv.config.obs_width
            k1, k2 = jax.random.split(k_aug)
            s1 = aug_random_shift(s1, k1, aug_shift, h, w)
            s2 = aug_random_shift(s2, k2, aug_shift, h, w)
        # TD target from target nets (reference ddpg ~L150-280).
        a2 = actor.apply(target_a, s2)
        if target_noise > 0.0:
            # TD3 target-policy smoothing: the target Q is evaluated under a
            # blurred action, so a critic spike at one action can't keep
            # bootstrapping itself.
            eps = jnp.clip(
                target_noise * jax.random.normal(k_tn, a2.shape),
                -target_noise_clip, target_noise_clip,
            )
            a2 = jnp.clip(a2 + eps, -1.0, 1.0)
        if twin_critic:
            q2 = jnp.min(
                jax.vmap(lambda p: critic.apply(p, s2, a2))(target_c), axis=0
            )
        else:
            q2 = critic.apply(target_c, s2, a2)
        # n-step: r is the accumulated n-step return, term flags any
        # terminal in the window, bootstrap discount is gamma^n.
        y = (reward_scale * r
             + gamma**n_step * (1.0 - term.astype(jnp.float32)) * q2)
        c_aux = {k: v for k, v in critic_vars.items() if k != "params"}
        (closs, (c_aux, td_abs)), cgrads = jax.value_and_grad(
            critic_loss_fn, has_aux=True
        )(critic_vars["params"], c_aux, s1, a, jax.lax.stop_gradient(y), iw)
        if axis_name is not None:
            cgrads = jax.lax.pmean(cgrads, axis_name)
        cupd, copt = critic_tx.update(cgrads, copt, critic_vars["params"])
        critic_vars = {
            **c_aux, "params": optax.apply_updates(critic_vars["params"], cupd)
        }

        def actor_and_targets(ops):
            actor_vars, aopt, target_a, target_c = ops
            a_aux = {k: v for k, v in actor_vars.items() if k != "params"}
            (aloss, a_aux), agrads = jax.value_and_grad(
                actor_loss_fn, has_aux=True
            )(actor_vars["params"], a_aux, critic_vars, s1)
            if axis_name is not None:
                agrads = jax.lax.pmean(agrads, axis_name)
            aupd, aopt = actor_tx.update(agrads, aopt, actor_vars["params"])
            actor_vars = {
                **a_aux, "params": optax.apply_updates(actor_vars["params"], aupd)
            }
            return (
                actor_vars, aopt,
                soft_target_update(target_a, actor_vars, tau),
                soft_target_update(target_c, critic_vars, tau),
            ), aloss

        ops = (actor_vars, aopt, target_a, target_c)
        if policy_delay > 1:
            # TD3 delayed policy: actor + BOTH target nets update every
            # policy_delay critic updates.  The predicate is replicated
            # across chips (env_steps is), so the cond is uniform and the
            # pmean inside executes on every chip on the same steps.
            (actor_vars, aopt, target_a, target_c), aloss = jax.lax.cond(
                (step - warmup_steps - 1) % policy_delay == 0,
                actor_and_targets,
                lambda ops: (ops, jnp.zeros(())),
                ops,
            )
        else:
            (actor_vars, aopt, target_a, target_c), aloss = actor_and_targets(ops)

        bundle = (actor_vars, critic_vars, target_a, target_c, aopt, copt)
        return bundle, {"critic_loss": closs, "actor_loss": aloss}, td_abs

    def segment(st: DDPGState):
        if axis_name is not None:
            # st.rng arrives replicated; decorrelate per-device streams.
            st = st.replace(
                rng=jax.random.fold_in(st.rng, jax.lax.axis_index(axis_name))
            )
        rng, k_pool = jax.random.split(st.rng)
        st = st.replace(rng=rng)
        reset_pool = venv.reset(k_pool)

        reset_obs = reset_pool[1]

        def body(carry, _):
            # The scan carries (st, prev_done) with st.obs holding the RAW
            # previous-step obs; the auto-reset substitution is applied
            # LAZILY at each consumption site (actor input, replay s1) via
            # resolve_obs, so the full-slab select never materializes
            # (env/vector.py round-3 obs-pipeline fix).
            st, prev_done = carry
            rng, k_ou, k_sample, k_aug = jax.random.split(st.rng, 4)
            # The obs to act on: reset obs for envs that finished last step
            # — acting on the terminal frame of the finished episode would
            # poison both the policy's first new-episode action and replay.
            obs_in = vector_mod.resolve_obs(prev_done, reset_obs, st.obs)
            # Explore: µ(s) + OU noise (reference adds OU to actor output).
            sigma = common.ou_sigma_at(
                st.env_steps, ou_sigma, ou_sigma_min, ou_decay_steps
            )
            ou = ou_step(st.ou_noise, k_ou, theta=ou_theta, sigma=sigma)
            action = jnp.clip(actor.apply(st.actor_params, obs_in) + ou, -1.0, 1.0)
            env_states, obs2, reward, done = venv.step_lazy(
                st.env_states, action, reset_pool
            )
            store = st.replay.s1.dtype
            # s2-free mode (block > 0): the next step's s1 write doubles as
            # this transition's s2 — skip the 2nd full-obs encode+write.
            s2 = None if st.replay.block else replay_mod.encode_obs(obs2, store)
            replay = replay_mod.add_batch(
                st.replay,
                replay_mod.encode_obs(obs_in, store),
                action,
                reward,
                s2,
                done,
            )
            # OU noise resets with the episode.
            ou = jnp.where(done[:, None], 0.0, ou)
            st = st.replace(
                replay=replay,
                env_states=env_states,
                obs=obs2,
                ou_noise=ou,
                rng=rng,
                env_steps=st.env_steps + 1,
            )
            # Sample OUTSIDE the cond (reads are cheap); only the small
            # learner bundle flows through the conditional.
            if per:
                beta = per_beta0 + (1.0 - per_beta0) * jnp.clip(
                    st.env_steps.astype(jnp.float32) / per_total_steps,
                    0.0, 1.0,
                )
                batch, p_idx, iw = replay_mod.sample_prioritized(
                    st.replay, k_sample, batch_size, per_alpha, beta,
                    n_step=n_step, gamma=gamma,
                )
            else:
                batch = replay_mod.sample(
                    st.replay, k_sample, batch_size,
                    n_step=n_step, gamma=gamma,
                )
                iw = jnp.ones((batch_size,), jnp.float32)
            bundle = (
                st.actor_params, st.critic_params,
                st.target_actor_params, st.target_critic_params,
                st.actor_opt, st.critic_opt,
            )
            # Gate on the buffer actually being warm, not just the step
            # counter (--ckpt-skip-replay resume; see replay_min_fill).
            min_fill = common.replay_min_fill(
                warmup_steps, venv.num_envs, st.replay.capacity, n_step
            )
            trained = (st.env_steps > warmup_steps) & (
                st.replay.size >= min_fill
            )
            bundle, losses, td_abs = jax.lax.cond(
                trained,
                lambda b: train_once(b, batch, iw, k_aug, st.env_steps),
                lambda b: (b, {"critic_loss": jnp.zeros(()), "actor_loss": jnp.zeros(())},
                           jnp.zeros((batch_size,), jnp.float32)),
                bundle,
            )
            st = st.replace(
                actor_params=bundle[0], critic_params=bundle[1],
                target_actor_params=bundle[2], target_critic_params=bundle[3],
                actor_opt=bundle[4], critic_opt=bundle[5],
            )
            if per:
                st = st.replace(replay=replay_mod.update_priorities(
                    st.replay, p_idx, td_abs, per_eps, gate=trained
                ))
            metrics = {**losses, "reward": jnp.mean(reward),
                       "done_frac": jnp.mean(done.astype(jnp.float32))}
            return (st, done), (metrics, done)

        no_done = jnp.zeros((venv.num_envs,), bool)
        (st, last_done), (metrics, dones) = jax.lax.scan(
            body, (st, no_done), None, length=steps_per_segment
        )
        # Segment boundary: materialize the substitution ONCE (the next
        # segment draws a fresh reset pool, so prev_done must not leak).
        st = st.replace(obs=vector_mod.resolve_obs(last_done, reset_obs, st.obs))
        metrics = jax.tree.map(jnp.mean, metrics)
        # Reset-pool reuse diagnostic (VERDICT r1 weak #7): an env that
        # terminates twice within one segment restarts from the SAME pooled
        # reset state.  double_reset_frac = fraction of resets this segment
        # that were such reuses — observed ≈0 for trained policies
        # (episode ≫ segment) and small even for random ones.
        counts = jnp.sum(dones.astype(jnp.float32), axis=0)  # (E,)
        total = jnp.maximum(jnp.sum(counts), 1.0)
        metrics["double_reset_frac"] = jnp.sum(jnp.maximum(counts - 1.0, 0.0)) / total
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
            # Re-replicate the carried rng (devices diverged via fold_in).
            st = st.replace(
                rng=jax.lax.all_gather(st.rng, axis_name, axis=0)[0]
            )
        return st, metrics

    return segment


def greedy_act(actor: Actor):
    def act(params, obs):
        return actor.apply(params, obs)

    return act


def init_state(opts, config, venv, actor, critic, actor_tx, critic_tx) -> DDPGState:
    rng = jax.random.PRNGKey(opts.seed)
    rng, k_a, k_c, k_env = jax.random.split(rng, 4)
    dummy_obs = jnp.zeros((2,) + config.obs_shape, jnp.float32)
    dummy_act = jnp.zeros((2, 2), jnp.float32)
    actor_params = dict(actor.init(k_a, dummy_obs, train=False))
    if getattr(opts, "twin_critic", False):
        # TD3 twins: two independent inits stacked on a leading axis; the
        # tree STRUCTURE matches the single-critic one (checkpoints and the
        # distributed state specs are shape-agnostic), only leaves gain a
        # leading 2.
        critic_params = jax.vmap(
            lambda k: dict(critic.init(k, dummy_obs, dummy_act, train=False))
        )(jax.random.split(k_c, 2))
    else:
        critic_params = dict(critic.init(k_c, dummy_obs, dummy_act, train=False))
    env_states, obs = venv.reset(k_env)
    # Pixel observations are stored quantized (uint8): 4× less HBM traffic
    # and capacity on the hot path.
    obs_dtype = jnp.uint8 if config.use_raw_pixels else jnp.float32
    replay = replay_mod.create(
        opts.replay_capacity, config.obs_shape, (2,), obs_dtype=obs_dtype,
        block=common.replay_block(opts, venv.num_envs),
        prioritized=getattr(opts, "per", False),
    )
    return DDPGState(
        actor_params=actor_params,
        critic_params=critic_params,
        target_actor_params=jax.tree.map(jnp.copy, actor_params),
        target_critic_params=jax.tree.map(jnp.copy, critic_params),
        actor_opt=actor_tx.init(actor_params["params"]),
        critic_opt=critic_tx.init(critic_params["params"]),
        replay=replay,
        env_states=env_states,
        obs=obs,
        ou_noise=ou_init((venv.num_envs, 2)),
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
    actor = Actor(action_dim=2, use_raw_pixels=config.use_raw_pixels,
                  pixel_encoder=opts.pixel_encoder,
                  pixel_pool=opts.pixel_pool, hidden=tuple(opts.hidden),
                  height=config.obs_height, width=config.obs_width,
                  use_batch_norm=opts.use_batch_norm)
    critic = Critic(use_raw_pixels=config.use_raw_pixels,
                    pixel_encoder=opts.pixel_encoder,
                    pixel_pool=opts.pixel_pool, hidden=tuple(opts.hidden),
                    height=config.obs_height, width=config.obs_width,
                    use_batch_norm=opts.use_batch_norm)

    def tx(base_lr):
        lr = common.make_lr(opts, base_lr)
        if opts.grad_clip > 0:
            return optax.chain(
                optax.clip_by_global_norm(opts.grad_clip), optax.adam(lr)
            )
        return optax.adam(lr)

    actor_tx = tx(opts.actor_learning_rate)
    critic_tx = tx(opts.critic_learning_rate)
    logger = MetricsLogger(opts.metrics_jsonl, tb_dir=getattr(opts, "tb_dir", None))

    st = init_state(opts, config, venv, actor, critic, actor_tx, critic_tx)
    if getattr(opts, "n_step", 1) > 1:
        if not st.replay.block:
            raise SystemExit(
                "--n-step > 1 needs the s2-free block replay (capacity must "
                "hold at least two num-envs blocks per device shard)"
            )
        # st.replay.block is already per-shard (replay_block divides by
        # --num-devices); compare against the per-shard capacity too.
        shard_cap = st.replay.capacity // max(getattr(opts, "num_devices", 1), 1)
        if shard_cap < (opts.n_step + 1) * st.replay.block:
            # Smaller rings make the valid-window clamp degenerate: the
            # only sampleable row's n-step successor is unwritten zeros or
            # wraps onto the row itself (replay.nstep_batch stride math).
            raise SystemExit(
                f"--n-step {opts.n_step} needs replay capacity >= "
                f"{opts.n_step + 1} blocks of num-envs transitions per "
                f"device shard (got {shard_cap} < "
                f"{(opts.n_step + 1) * st.replay.block})"
            )
    start_segment = 0
    restored = None
    multiproc = getattr(opts, "num_processes", 1) > 1
    if opts.ckpt_dir and not multiproc:
        st, restored = common.restore_for_startup(opts, st)
        if restored is not None:
            # Resume the segment counter too, so checkpoint numbering stays
            # monotonic — restarting at 0 would re-save ckpt_1..N with newer
            # weights UNDER older files, and a later restore_latest would pick
            # the stale pre-resume checkpoint.
            start_segment = restored
            logger.log("restore", step=restored)
    if opts.eval_only:
        return common.run_eval_only(opts, config, logger, restored,
                                    eval_venv, greedy_act(actor),
                                    st.actor_params)

    if getattr(opts, "num_devices", 1) > 1:
        # Multi-chip data parallelism: env/replay shards per device,
        # replicated params, gradient pmean over ICI (parallel/distributed).
        from cartpoleplusplus_tpu.parallel import (
            make_distributed_segment,
            make_mesh,
        )

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
        build, shard_state = make_distributed_segment(
            mesh, local_venv, actor, critic, actor_tx, critic_tx,
            gamma=opts.gamma, tau=opts.tau,
            batch_size=opts.batch_size // opts.num_devices or 1,
            warmup_steps=opts.warmup_steps,
            steps_per_segment=opts.steps_per_segment,
            ou_theta=opts.ou_theta, ou_sigma=opts.ou_sigma,
            ou_sigma_min=opts.ou_sigma_min,
            ou_decay_steps=opts.ou_decay_steps,
            reward_scale=opts.reward_scale,
            aug_shift=opts.aug_shift,
            twin_critic=opts.twin_critic,
            policy_delay=opts.policy_delay,
            target_noise=opts.target_noise,
            target_noise_clip=opts.target_noise_clip,
            per_alpha=opts.per_alpha if opts.per else None,
            per_beta0=opts.per_beta0, per_eps=opts.per_eps,
            per_total_steps=opts.num_train_batches * opts.steps_per_segment,
            n_step=opts.n_step,
        )
        st = shard_state(st)
        segment = build(st)
        if opts.ckpt_dir and multiproc:
            # Rank-sharded resume AFTER mesh placement: each rank reads its
            # own ckpt_<step>.rank<k>of<n> shard (utils/checkpoint.py) —
            # SURVEY §5 failure recovery extended to multi-host jobs.
            st, restored = ckpt_mod.restore_latest_sharded(opts.ckpt_dir, st)
            if restored is not None:
                start_segment = restored
                logger.log("restore", step=restored)
    else:
        segment = jax.jit(
            make_segment(
                venv, actor, critic, actor_tx, critic_tx,
                gamma=opts.gamma, tau=opts.tau, batch_size=opts.batch_size,
                warmup_steps=opts.warmup_steps,
                steps_per_segment=opts.steps_per_segment,
                ou_theta=opts.ou_theta, ou_sigma=opts.ou_sigma,
                ou_sigma_min=opts.ou_sigma_min,
                ou_decay_steps=opts.ou_decay_steps,
                reward_scale=opts.reward_scale,
                aug_shift=opts.aug_shift,
                twin_critic=opts.twin_critic,
                policy_delay=opts.policy_delay,
                target_noise=opts.target_noise,
                target_noise_clip=opts.target_noise_clip,
                per_alpha=opts.per_alpha if opts.per else None,
                per_beta0=opts.per_beta0, per_eps=opts.per_eps,
                per_total_steps=opts.num_train_batches * opts.steps_per_segment,
                n_step=opts.n_step,
            ),
            donate_argnums=0,
        )
    eval_fn = jax.jit(
        lambda p, k: common.eval_rollout(eval_venv, greedy_act(actor), p, k)
    )

    rng = jax.random.PRNGKey(opts.seed + 1)
    final_eval = 0.0
    best_keeper = common.BestCkptKeeper(opts, multiproc)
    # Multi-process jobs: params are GLOBAL replicated arrays that a
    # process-local eval jit can't consume — fetch the (identical) local
    # copy to host first; every process then evaluates independently and
    # deterministically (same params, same key).
    multiproc = getattr(opts, "num_processes", 1) > 1
    for i in range(start_segment, opts.num_train_batches):
        st, metrics = segment(st)
        if (i + 1) % max(opts.eval_freq, 1) == 0 or i + 1 == opts.num_train_batches:
            rng, k_eval = jax.random.split(rng)
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
                mean_reward=float(metrics["reward"]),
                double_reset_frac=float(metrics["double_reset_frac"]),
                eval_ep_len=float(elen),
                eval_ep_rew=float(erew),
            )
        if opts.ckpt_dir and (i + 1) % max(opts.ckpt_freq, 1) == 0:
            ckpt_mod.save(opts.ckpt_dir, i + 1, st, skip_replay=opts.ckpt_skip_replay)
    if opts.ckpt_dir:
        ckpt_mod.save(opts.ckpt_dir, max(opts.num_train_batches, start_segment), st,
                      skip_replay=opts.ckpt_skip_replay)
    # Ranks > 0 have event-log/export flags cleared — only fetch the
    # params D2H when this rank will actually use them.
    needs_tail = bool(opts.event_log_out
                      or getattr(opts, "export_policy", None))
    tail_params = (common.host_fetch(st.actor_params)
                   if multiproc and needs_tail else st.actor_params)
    if opts.event_log_out:
        # Reference README-GIF evidence path (SURVEY.md §6): greedy eval
        # episodes → event log; GIFs via utils.event_log --gif-out.
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
        "DDPG agent on cartpole++ (TPU rebuild of ddpg_cartpole.py)"
    )
    add_ddpg_opts(parser)
    opts = parser.parse_args(argv)
    common.maybe_init_multihost(opts, supported=True)
    print(f"OPTS {vars(opts)}", file=sys.stderr)
    train(opts)


if __name__ == "__main__":
    # Re-enter through the canonical module: under ``python -m`` this file
    # executes as __main__, and flax dataclasses defined here would register
    # as DIFFERENT pytree node types than the ones other modules import
    # (breaking e.g. the distributed path's tree_maps).
    from cartpoleplusplus_tpu.agents.ddpg import main as _main

    _main()
