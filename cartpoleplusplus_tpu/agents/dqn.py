"""DQN agent — discrete actions, ε-greedy, replay, target network.

The reference's ``dqn_cartpole.py`` (~100 LoC, SURVEY.md §2.1) is thin glue
around keras-rl: Keras Q-MLP + EpsGreedyQPolicy + SequentialMemory +
``DQNAgent.fit(env)`` — its point is that the env is gym-compatible with
third-party agent libraries.  The rebuild provides the same capability as a
native fused DQN (keras-rl is TF-1.x-era and has no TPU path): Q-network +
target, ε-greedy with linear decay, uniform replay, per-step TD(0) updates —
the same fused-segment architecture as agents/ddpg.py.  Gym compatibility
itself is demonstrated by env/gym_env.py + tests/test_env.py.
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
from cartpoleplusplus_tpu.env.config import NUM_DISCRETE_ACTIONS, config_from_opts
from cartpoleplusplus_tpu.env import vector as vector_mod
from cartpoleplusplus_tpu.env.vector import VectorCartpole
from cartpoleplusplus_tpu.models import QNetwork, soft_target_update
from cartpoleplusplus_tpu.replay import ReplayState
from cartpoleplusplus_tpu.replay import buffer as replay_mod
from cartpoleplusplus_tpu.utils import checkpoint as ckpt_mod
from cartpoleplusplus_tpu.utils.metrics import MetricsLogger


@struct.dataclass
class DQNState:
    params: dict
    target_params: dict
    opt: optax.OptState
    replay: ReplayState
    env_states: EnvState
    obs: jnp.ndarray
    rng: jax.Array
    env_steps: jnp.ndarray


def add_dqn_opts(parser):
    common.add_lr_schedule_opt(parser)
    parser.add_argument("--grad-clip", type=float, default=0.0,
                        help="global-norm gradient clip (0 = off)")
    parser.add_argument("--reward-scale", type=float, default=1.0,
                        help="scale rewards in the TD target (stabilizes Q "
                             "when returns approach 1/(1-gamma), as for "
                             "DDPG/NAF)")
    parser.add_argument("--double-q", action="store_true", default=True,
                        help="double DQN: bootstrap from the TARGET net's "
                             "value of the ONLINE net's argmax action — "
                             "kills the max-operator overestimation spiral "
                             "(2 of 3 seeds diverged without it, loss "
                             "0.2 → 40-160).  Default ON, matching "
                             "keras-rl DQNAgent's enable_double_dqn default "
                             "(the reference's agent)")
    parser.add_argument("--no-double-q", dest="double_q",
                        action="store_false")
    parser.add_argument("--tau", type=float, default=0.01,
                        help="target soft-update rate")
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--replay-capacity", type=int, default=100000)
    parser.add_argument("--warmup-steps", type=int, default=20)
    parser.add_argument("--steps-per-segment", type=int, default=25)
    # None sentinels (not the literal defaults) so an EXPLICIT
    # --eps-start 1.0 still overrides --noisy's zeroing below.
    parser.add_argument("--eps-start", type=float, default=None,
                        help="default 1.0 (0 under --noisy)")
    parser.add_argument("--eps-end", type=float, default=None,
                        help="default 0.05 (0 under --noisy)")
    parser.add_argument("--eps-decay-steps", type=int, default=5000,
                        help="vectorized steps (segments × steps-per-segment, "
                             "each stepping all --num-envs replicas at once) "
                             "over which ε anneals linearly; the env_steps "
                             "METRIC counts env transitions, i.e. this × "
                             "num-envs")
    common.add_per_opts(parser)  # --per* and --n-step (shared helper)
    parser.add_argument("--dueling", action="store_true",
                        help="dueling Q head: Q = V(s) + A(s,a) - mean A "
                             "(Wang et al.); shared encoder, two MXU heads")
    parser.add_argument("--c51", type=int, default=0, metavar="ATOMS",
                        help="distributional RL (C51): the Q head outputs "
                             "ATOMS categorical logits per action on a "
                             "fixed support; targets project through the "
                             "hat-function matrix (one (B,K,K) contraction "
                             "— no scatters).  51 is the classic setting")
    parser.add_argument("--c51-vmin", type=float, default=0.0,
                        help="support lower edge (scaled-return units)")
    parser.add_argument("--c51-vmax", type=float, default=12.0,
                        help="support upper edge — must cover "
                             "reward-scale x max discounted return "
                             "(~10 at --reward-scale 0.1, gamma 0.99)")
    parser.add_argument("--noisy", action="store_true",
                        help="NoisyNet heads (factorized Gaussian, Fortunato "
                             "et al.): exploration becomes learned and "
                             "state-conditional, replacing eps-greedy — "
                             "when set, the default eps schedule is forced "
                             "to 0 (override by passing --eps-start/--eps-"
                             "end explicitly)")
    parser.add_argument("--num-devices", type=int, default=1,
                        help="shard envs+replay over this many devices "
                             "(shard_map data parallelism; params replicate, "
                             "grads pmean over ICI). num-envs and replay "
                             "capacity must divide evenly.")


def _categorical_projection(p_next, tz, z):
    """C51 target projection, scatter-free.

    Each Bellman-mapped atom ``tz_j`` (clipped to the support) splits its
    probability mass between its two neighboring support atoms in
    proportion to proximity — exactly the hat function
    ``clip(1 - |b_j - i|, 0, 1)`` evaluated at every atom index i.  The
    projected distribution is then one (B,K)x(B,K,K) contraction: tiny,
    dense, layout-friendly — the TPU-native replacement for the classic
    per-sample floor/ceil scatter loop.
    """
    dz = z[1] - z[0]
    b = (jnp.clip(tz, z[0], z[-1]) - z[0]) / dz  # (B, K) in atom units
    iota = jnp.arange(z.shape[0], dtype=jnp.float32)
    w = jnp.clip(1.0 - jnp.abs(b[:, :, None] - iota[None, None, :]), 0.0, 1.0)
    return jnp.einsum("bj,bjk->bk", p_next, w)


def make_segment(
    venv: VectorCartpole,
    qnet: QNetwork,
    tx,
    *,
    gamma: float,
    tau: float,
    batch_size: int,
    warmup_steps: int,
    steps_per_segment: int,
    eps_start: float,
    eps_end: float,
    eps_decay_steps: int,
    reward_scale: float = 1.0,
    double_q: bool = False,
    per_alpha: float | None = None,
    per_beta0: float = 0.4,
    per_total_steps: int = 1,
    per_eps: float = 1e-2,
    n_step: int = 1,
    c51_atoms: int = 0,
    c51_vmin: float = 0.0,
    c51_vmax: float = 12.0,
    noisy: bool = False,
    axis_name: str | None = None,
):
    per = per_alpha is not None
    # C51 support: HOST numpy, never jnp — an eager jnp.linspace here becomes
    # a device array closed over by the jitted segment, which the tunnel
    # backend rejects at D2H constant export (CLAUDE.md gotcha; crashed the
    # round-4 full-scale Rainbow run). tests/test_segment_consts.py guards
    # this class of bug for every agent.
    z = (np.linspace(c51_vmin, c51_vmax, c51_atoms, dtype=np.float32)
         if c51_atoms else None)

    def apply_q(params, obs, key=None):
        """qnet.apply with a fresh NoisyNet draw when a key is given."""
        if noisy and key is not None:
            return qnet.apply(params, obs, noise=True, rngs={"noise": key})
        return qnet.apply(params, obs)

    def q_scalar(params, obs, key=None):
        """Scalar Q(s, ·) for acting/selection: the distribution's mean
        under C51, the head output otherwise."""
        out = apply_q(params, obs, key)
        if c51_atoms:
            return jnp.sum(jax.nn.softmax(out, axis=-1) * z, axis=-1)
        return out

    def loss_fn(params, s1, a, y, iw, k_noise=None):
        q = apply_q(params, s1, k_noise)
        q_a = jnp.take_along_axis(q, a[:, None].astype(jnp.int32), axis=1)[:, 0]
        td = q_a - y
        # iw is all-ones on the uniform path, the importance-sampling
        # correction (N·P)^-beta under PER.
        return jnp.mean(iw * td**2), jnp.abs(td)

    def c51_loss_fn(params, s1, a, m, iw, k_noise=None):
        logits = apply_q(params, s1, k_noise)  # (B, A, K)
        logp = jax.nn.log_softmax(logits, axis=-1)
        logp_a = logp[jnp.arange(logp.shape[0]), a.astype(jnp.int32)]
        ce = -jnp.sum(m * logp_a, axis=-1)  # (B,) cross-entropy
        # ce doubles as the PER priority (Rainbow: KL-derived magnitude).
        return jnp.mean(iw * ce), ce

    # Learner bundle threaded through lax.cond separately from the big
    # buffers (see agents/ddpg.py for the rationale).
    def train_once(bundle, batch, iw, k_noise):
        params, target_params, opt = bundle
        s1, a, r, s2, term = batch
        s1, s2 = replay_mod.decode_obs(s1), replay_mod.decode_obs(s2)
        live = 1.0 - term.astype(jnp.float32)
        # Independent NoisyNet draws per forward (Rainbow convention):
        # target(s2), online selection(s2), online loss(s1).
        kt, ks, kl = jax.random.split(k_noise, 3)
        if c51_atoms:
            p2_all = jax.nn.softmax(apply_q(target_params, s2, kt), axis=-1)
            if double_q:
                a2 = jnp.argmax(q_scalar(params, s2, ks), axis=-1)
            else:
                a2 = jnp.argmax(jnp.sum(p2_all * z, axis=-1), axis=-1)
            p2 = p2_all[jnp.arange(p2_all.shape[0]), a2]  # (B, K)
            # Bellman-map the support (n-step: r is the accumulated n-step
            # return, bootstrap discount gamma^n, terminal collapses the
            # support onto the clipped return atom) and project each target
            # atom's mass onto its two neighbors via the hat matrix.
            tz = (reward_scale * r[:, None]
                  + gamma**n_step * live[:, None] * z[None, :])
            m = _categorical_projection(p2, tz, z)
            (loss, td_abs), grads = jax.value_and_grad(
                c51_loss_fn, has_aux=True
            )(params, s1, a, jax.lax.stop_gradient(m), iw, kl)
        else:
            q2_t = apply_q(target_params, s2, kt)
            if double_q:
                # Double DQN (van Hasselt): online picks, target values.
                a2 = jnp.argmax(apply_q(params, s2, ks), axis=-1)
                q2 = jnp.take_along_axis(q2_t, a2[:, None], axis=1)[:, 0]
            else:
                q2 = jnp.max(q2_t, axis=-1)
            # n-step: r is the accumulated n-step return (already summed
            # with per-step gamma^k inside the sample) and term flags any
            # terminal in the window, so the bootstrap discount is gamma^n.
            y = reward_scale * r + gamma**n_step * live * q2
            (loss, td_abs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, s1, a, jax.lax.stop_gradient(y), iw, kl
            )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        upd, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, upd)
        return (
            params,
            soft_target_update(target_params, params, tau),
            opt,
        ), {"loss": loss}, td_abs

    def segment(st: DQNState):
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
            # (st, prev_done) carry with lazy auto-reset obs substitution —
            # see agents/ddpg.py round-3 notes and env/vector.resolve_obs.
            st, prev_done = carry
            rng, k_eps, k_rand, k_sample, k_act, k_tn = jax.random.split(
                st.rng, 6
            )
            obs_in = vector_mod.resolve_obs(prev_done, reset_obs, st.obs)
            q = q_scalar(st.params, obs_in, k_act)  # fresh noise per step
            greedy = jnp.argmax(q, axis=-1)
            random_a = jax.random.randint(
                k_rand, (venv.num_envs,), 0, NUM_DISCRETE_ACTIONS
            )
            frac = jnp.clip(
                st.env_steps.astype(jnp.float32) / eps_decay_steps, 0.0, 1.0
            )
            eps = eps_start + (eps_end - eps_start) * frac
            explore = jax.random.uniform(k_eps, (venv.num_envs,)) < eps
            action = jnp.where(explore, random_a, greedy).astype(jnp.int32)
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
            st = st.replace(
                replay=replay, env_states=env_states, obs=obs2,
                rng=rng, env_steps=st.env_steps + 1,
            )
            if per:
                beta = per_beta0 + (1.0 - per_beta0) * jnp.clip(
                    st.env_steps.astype(jnp.float32) / per_total_steps, 0.0, 1.0
                )
                batch, idx, iw = replay_mod.sample_prioritized(
                    st.replay, k_sample, batch_size, per_alpha, beta,
                    n_step=n_step, gamma=gamma,
                )
            else:
                batch = replay_mod.sample(
                    st.replay, k_sample, batch_size,
                    n_step=n_step, gamma=gamma,
                )
                iw = jnp.ones((batch_size,), jnp.float32)
            bundle = (st.params, st.target_params, st.opt)
            # Replay-warm gate (--ckpt-skip-replay resume; see
            # common.replay_min_fill).
            min_fill = common.replay_min_fill(
                warmup_steps, venv.num_envs, st.replay.capacity, n_step
            )
            trained = (st.env_steps > warmup_steps) & (st.replay.size >= min_fill)
            bundle, losses, td_abs = jax.lax.cond(
                trained,
                lambda b: train_once(b, batch, iw, k_tn),
                lambda b: (b, {"loss": jnp.zeros(())},
                           jnp.zeros((batch_size,), jnp.float32)),
                bundle,
            )
            st = st.replace(params=bundle[0], target_params=bundle[1], opt=bundle[2])
            if per:
                st = st.replace(replay=replay_mod.update_priorities(
                    st.replay, idx, td_abs, per_eps, gate=trained
                ))
            return (st, done), {**losses, "reward": jnp.mean(reward), "eps": eps}

        no_done = jnp.zeros((venv.num_envs,), bool)
        (st, last_done), metrics = jax.lax.scan(
            body, (st, no_done), None, length=steps_per_segment
        )
        # Segment boundary: materialize the substitution once (fresh pool
        # next segment).
        st = st.replace(obs=vector_mod.resolve_obs(last_done, reset_obs, st.obs))
        metrics = jax.tree.map(jnp.mean, metrics)
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
            # Re-replicate the carried rng (devices diverged via fold_in).
            st = st.replace(
                rng=jax.lax.all_gather(st.rng, axis_name, axis=0)[0]
            )
        return st, metrics

    return segment


DQN_SHARDED_FIELDS = ("replay", "env_states", "obs")
DQN_METRIC_KEYS = ("loss", "reward", "eps")


def greedy_act(qnet: QNetwork):
    def act(params, obs):
        out = qnet.apply(params, obs)
        if qnet.num_atoms:
            # The argmax of the distribution mean is invariant to any
            # affine remap of the support (probabilities sum to 1, so
            # E[αz+β] = αE[z]+β), and the training support is a uniform
            # linspace — so a unit linspace suffices here and greedy
            # acting needs no vmin/vmax plumbing.
            z = jnp.linspace(0.0, 1.0, qnet.num_atoms)
            out = jnp.sum(jax.nn.softmax(out, axis=-1) * z, axis=-1)
        return jnp.argmax(out, axis=-1)

    return act


def train(opts) -> float:
    config = config_from_opts(opts, discrete_actions=True)
    common.probe_raster_or_downgrade(config, opts)
    venv = common.make_venv(
        config, opts.num_envs,
        pallas_render=getattr(opts, "pallas_render", False),
        pallas_physics=getattr(opts, "pallas_physics", False),
        render_raster=getattr(opts, "render_raster", False),
    )
    eval_venv = common.make_venv(config, opts.num_eval)
    qnet = QNetwork(
        num_actions=NUM_DISCRETE_ACTIONS,
        use_raw_pixels=config.use_raw_pixels,
        pixel_encoder=opts.pixel_encoder,
        pixel_pool=opts.pixel_pool,
        height=config.obs_height, width=config.obs_width,
        hidden=tuple(opts.hidden),
        dueling=getattr(opts, "dueling", False),
        num_atoms=getattr(opts, "c51", 0),
        noisy=getattr(opts, "noisy", False),
    )
    if getattr(opts, "noisy", False):
        # NoisyNet IS the exploration mechanism; any eps flag left unset
        # backfills to 0 — NOT the 1.0/0.05 non-noisy defaults, which would
        # silently mix a surprising schedule when only one flag is given
        # (pass both --eps-start/--eps-end explicitly to mix regimes).
        if opts.eps_start is None and opts.eps_end is None:
            print("# --noisy: eps schedule -> 0 (learned exploration)",
                  file=sys.stderr)
        elif opts.eps_start is None or opts.eps_end is None:
            print("# --noisy: unset eps flag backfilled with 0.0",
                  file=sys.stderr)
        opts.eps_start = 0.0 if opts.eps_start is None else opts.eps_start
        opts.eps_end = 0.0 if opts.eps_end is None else opts.eps_end
    if opts.eps_start is None:
        opts.eps_start = 1.0
    if opts.eps_end is None:
        opts.eps_end = 0.05
    lr = common.make_lr(opts, opts.learning_rate)
    if getattr(opts, "grad_clip", 0.0) > 0:
        tx = optax.chain(
            optax.clip_by_global_norm(opts.grad_clip), optax.adam(lr)
        )
    else:
        tx = optax.adam(lr)
    logger = MetricsLogger(opts.metrics_jsonl, tb_dir=getattr(opts, "tb_dir", None))

    rng = jax.random.PRNGKey(opts.seed)
    rng, k_init, k_env = jax.random.split(rng, 3)
    dummy_obs = jnp.zeros((1,) + config.obs_shape, jnp.float32)
    params = qnet.init(k_init, dummy_obs)
    env_states, obs = venv.reset(k_env)
    st = DQNState(
        params=params,
        target_params=jax.tree.map(jnp.copy, params),
        opt=tx.init(params),
        replay=replay_mod.create(
            opts.replay_capacity, config.obs_shape, (), action_dtype=jnp.int32,
            obs_dtype=jnp.uint8 if config.use_raw_pixels else jnp.float32,
            block=common.replay_block(opts, venv.num_envs),
            prioritized=opts.per,
        ),
        env_states=env_states,
        obs=obs,
        rng=rng,
        env_steps=jnp.zeros((), jnp.int32),
    )
    if opts.n_step > 1:
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
            # Resume the segment counter so checkpoint numbering stays
            # monotonic across restarts (see agents/ddpg.py).
            start_segment = restored
            logger.log("restore", step=restored)
    if opts.eval_only:
        return common.run_eval_only(opts, config, logger, restored,
                                    eval_venv, greedy_act(qnet), st.params)

    if getattr(opts, "num_devices", 1) > 1:
        # Multi-chip DP: env/replay shards per device, replicated params,
        # gradient pmean over ICI (parallel/distributed.py, agent-generic).
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
            local_venv, qnet, tx,
            gamma=opts.gamma, tau=opts.tau,
            batch_size=opts.batch_size // opts.num_devices or 1,
            warmup_steps=opts.warmup_steps,
            steps_per_segment=opts.steps_per_segment,
            eps_start=opts.eps_start, eps_end=opts.eps_end,
            eps_decay_steps=opts.eps_decay_steps,
            reward_scale=opts.reward_scale,
            double_q=opts.double_q,
            per_alpha=opts.per_alpha if opts.per else None,
            per_beta0=opts.per_beta0,
            per_total_steps=opts.num_train_batches * opts.steps_per_segment,
            per_eps=opts.per_eps,
            n_step=opts.n_step,
            c51_atoms=opts.c51, c51_vmin=opts.c51_vmin,
            c51_vmax=opts.c51_vmax,
            noisy=opts.noisy,
            axis_name=mesh.axis_names[0],
        )
        segment, shard_state = make_distributed(
            mesh, per_chip, st, DQN_SHARDED_FIELDS, DQN_METRIC_KEYS
        )
        st = shard_state(st)
        if opts.ckpt_dir and multiproc:
            # Rank-sharded resume AFTER mesh placement (see agents/ddpg.py
            # and utils/checkpoint.restore_latest_sharded).
            st, restored = ckpt_mod.restore_latest_sharded(opts.ckpt_dir, st)
            if restored is not None:
                start_segment = restored
                logger.log("restore", step=restored)
    else:
        segment = jax.jit(
            make_segment(
                venv, qnet, tx,
                gamma=opts.gamma, tau=opts.tau, batch_size=opts.batch_size,
                warmup_steps=opts.warmup_steps,
                steps_per_segment=opts.steps_per_segment,
                eps_start=opts.eps_start, eps_end=opts.eps_end,
                eps_decay_steps=opts.eps_decay_steps,
                reward_scale=opts.reward_scale,
                double_q=opts.double_q,
                per_alpha=opts.per_alpha if opts.per else None,
                per_beta0=opts.per_beta0,
                per_total_steps=opts.num_train_batches * opts.steps_per_segment,
                per_eps=opts.per_eps,
                n_step=opts.n_step,
                c51_atoms=opts.c51, c51_vmin=opts.c51_vmin,
                c51_vmax=opts.c51_vmax,
                noisy=opts.noisy,
            ),
            donate_argnums=0,
        )
    eval_fn = jax.jit(
        lambda p, k: common.eval_rollout(eval_venv, greedy_act(qnet), p, k)
    )

    rng = jax.random.PRNGKey(opts.seed + 1)
    final_eval = 0.0
    best_keeper = common.BestCkptKeeper(opts, multiproc)
    for i in range(start_segment, opts.num_train_batches):
        st, metrics = segment(st)
        if (i + 1) % max(opts.eval_freq, 1) == 0 or i + 1 == opts.num_train_batches:
            rng, k_eval = jax.random.split(rng)
            # Multi-process: fetch the identical local replica for the
            # process-local eval jit (see agents/ddpg.py).
            eval_params = (common.host_fetch(st.params)
                           if multiproc else st.params)
            elen, erew = eval_fn(eval_params, k_eval)
            final_eval = float(elen)
            best_keeper.update(i + 1, final_eval, st)
            logger.log(
                "train",
                segment=i + 1,
                env_steps=int(st.env_steps) * venv.num_envs,
                loss=float(metrics["loss"]),
                eps=float(metrics["eps"]),
                mean_reward=float(metrics["reward"]),
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
    tail_params = (common.host_fetch(st.params)
                   if multiproc and needs_tail else st.params)
    if opts.event_log_out:
        # Reference README-GIF evidence path (SURVEY.md §6): greedy eval
        # episodes → event log; GIFs via utils.event_log --gif-out.
        lens = common.record_eval_episodes(
            config, greedy_act(qnet), tail_params,
            opts.event_log_out, seed=opts.seed,
            raster=getattr(opts, "render_raster", False),
        )
        logger.log("event_log", episodes=len(lens), lengths=lens)
    common.maybe_export_policy(opts, config, greedy_act(qnet), tail_params,
                               logger)
    logger.close()
    return final_eval


def main(argv=None):
    parser = common.make_parser(
        "DQN agent on cartpole++ (TPU rebuild of dqn_cartpole.py)"
    )
    add_dqn_opts(parser)
    opts = parser.parse_args(argv)
    common.maybe_init_multihost(opts, supported=True)
    print(f"OPTS {vars(opts)}", file=sys.stderr)
    train(opts)


if __name__ == "__main__":
    # Re-enter through the canonical module: under ``python -m`` this file
    # executes as __main__, and flax dataclasses defined here would register
    # as DIFFERENT pytree node types than the ones other modules import
    # (breaking e.g. the distributed path's tree_maps).
    from cartpoleplusplus_tpu.agents.dqn import main as _main

    _main()
