"""NAF agent — Normalized Advantage Functions, continuous actions.

Rebuild of the reference's ``naf_cartpole.py`` (~350 LoC, SURVEY.md §2.1/
§3.3): one network emits V(s), µ(s) and lower-triangular L(s) (diagonal
exponentiated); ``A(s,a) = -½ (a-µ)ᵀ L Lᵀ (a-µ)``, ``Q = V + A``; the TD
target uses the *target network's V only*: ``r + γ·V'(s2)``; exploration is
noise on µ; batch-norm is the reference's --use-batch-norm option (its README
discusses the fiddliness; here flax BatchNorm stats thread functionally
through the fused loop).

Same fused-segment architecture as agents/ddpg.py: act → step → replay →
train → target update, all inside one jitted ``lax.scan``.
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
from cartpoleplusplus_tpu.env import vector as vector_mod
from cartpoleplusplus_tpu.env.vector import VectorCartpole
from cartpoleplusplus_tpu.models import NAFNetwork, soft_target_update
from cartpoleplusplus_tpu.replay import ReplayState
from cartpoleplusplus_tpu.replay import buffer as replay_mod
from cartpoleplusplus_tpu.utils import checkpoint as ckpt_mod
from cartpoleplusplus_tpu.utils.metrics import MetricsLogger
from cartpoleplusplus_tpu.utils.noise import ou_init, ou_step


@struct.dataclass
class NAFState:
    variables: dict  # {'params': ..., possibly 'batch_stats': ...}
    target_variables: dict
    opt: optax.OptState
    replay: ReplayState
    env_states: EnvState
    obs: jnp.ndarray
    ou_noise: jnp.ndarray
    rng: jax.Array
    env_steps: jnp.ndarray


def add_naf_opts(parser):
    parser.add_argument("--tau", type=float, default=0.005)
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--replay-capacity", type=int, default=100000)
    parser.add_argument("--warmup-steps", type=int, default=20)
    parser.add_argument("--steps-per-segment", type=int, default=25)
    parser.add_argument("--ou-theta", type=float, default=0.15)
    parser.add_argument("--ou-sigma", type=float, default=0.2)
    common.add_ou_anneal_opts(parser)
    parser.add_argument("--use-batch-norm", action="store_true")
    parser.add_argument("--reward-scale", type=float, default=1.0,
                        help="scale rewards in the TD target (stabilizes V "
                             "when returns approach 1/(1-gamma))")
    parser.add_argument("--grad-clip", type=float, default=0.0,
                        help="global-norm gradient clip (0 = off)")
    common.add_lr_schedule_opt(parser)
    parser.add_argument("--num-devices", type=int, default=1,
                        help="shard envs+replay over this many devices "
                             "(shard_map data parallelism; params replicate, "
                             "grads pmean over ICI). num-envs and replay "
                             "capacity must divide evenly.")


def _apply(net: NAFNetwork, variables, obs, train: bool):
    """Apply with functional batch-stats threading when BN is enabled."""
    if "batch_stats" in variables and train:
        out, mutated = net.apply(variables, obs, train=True, mutable=["batch_stats"])
        return out, {**variables, **mutated}
    return net.apply(variables, obs, train=False), variables


def make_segment(
    venv: VectorCartpole,
    net: NAFNetwork,
    tx,
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
    axis_name: str | None = None,
):
    def loss_fn(params, aux_vars, s1, a, y):
        variables = {**aux_vars, "params": params}
        (v, mu, l_flat), new_vars = _apply(net, variables, s1, train=True)
        q = NAFNetwork.q_value(v, l_flat, mu, a)
        return jnp.mean((q - y) ** 2), new_vars

    # Learner bundle threaded through lax.cond separately from the big
    # buffers (see agents/ddpg.py for the rationale: cond selects over every
    # carried leaf, which would copy the replay/obs arrays every step).
    def train_once(bundle, batch):
        variables, target_variables, opt = bundle
        s1, a, r, s2, term = batch
        s1, s2 = replay_mod.decode_obs(s1), replay_mod.decode_obs(s2)
        (v2, _, _), _ = _apply(net, target_variables, s2, train=False)
        y = reward_scale * r + gamma * (1.0 - term.astype(jnp.float32)) * v2
        aux = {k: v for k, v in variables.items() if k != "params"}
        (loss, new_vars), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"], aux, s1, a, jax.lax.stop_gradient(y)
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        upd, opt = tx.update(grads, opt, variables["params"])
        params = optax.apply_updates(variables["params"], upd)
        variables = {**new_vars, "params": params}
        bundle = (
            variables,
            soft_target_update(target_variables, variables, tau),
            opt,
        )
        return bundle, {"loss": loss}

    def segment(st: NAFState):
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
            rng, k_ou, k_sample = jax.random.split(st.rng, 3)
            obs_in = vector_mod.resolve_obs(prev_done, reset_obs, st.obs)
            (_, mu, _), _ = _apply(net, st.variables, obs_in, train=False)
            sigma = common.ou_sigma_at(
                st.env_steps, ou_sigma, ou_sigma_min, ou_decay_steps
            )
            ou = ou_step(st.ou_noise, k_ou, theta=ou_theta, sigma=sigma)
            action = jnp.clip(mu + ou, -1.0, 1.0)
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
            ou = jnp.where(done[:, None], 0.0, ou)
            st = st.replace(
                replay=replay, env_states=env_states, obs=obs2, ou_noise=ou,
                rng=rng, env_steps=st.env_steps + 1,
            )
            batch = replay_mod.sample(st.replay, k_sample, batch_size)
            bundle = (st.variables, st.target_variables, st.opt)
            # Replay-warm gate (--ckpt-skip-replay resume; see
            # common.replay_min_fill).
            min_fill = common.replay_min_fill(
                warmup_steps, venv.num_envs, st.replay.capacity
            )
            bundle, losses = jax.lax.cond(
                (st.env_steps > warmup_steps) & (st.replay.size >= min_fill),
                lambda b: train_once(b, batch),
                lambda b: (b, {"loss": jnp.zeros(())}),
                bundle,
            )
            st = st.replace(
                variables=bundle[0], target_variables=bundle[1], opt=bundle[2]
            )
            return (st, done), {**losses, "reward": jnp.mean(reward)}

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


NAF_SHARDED_FIELDS = ("replay", "env_states", "obs", "ou_noise")
NAF_METRIC_KEYS = ("loss", "reward")


def greedy_act(net: NAFNetwork):
    def act(variables, obs):
        (_, mu, _), _ = _apply(net, variables, obs, train=False)
        return mu

    return act


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
    net = NAFNetwork(
        action_dim=2,
        use_raw_pixels=config.use_raw_pixels,
        pixel_encoder=opts.pixel_encoder,
        pixel_pool=opts.pixel_pool,
        height=config.obs_height, width=config.obs_width,
        hidden=tuple(opts.hidden),
        use_batch_norm=opts.use_batch_norm,
    )
    lr = common.make_lr(opts, opts.learning_rate)
    if opts.grad_clip > 0:
        tx = optax.chain(
            optax.clip_by_global_norm(opts.grad_clip),
            optax.adam(lr),
        )
    else:
        tx = optax.adam(lr)
    logger = MetricsLogger(opts.metrics_jsonl, tb_dir=getattr(opts, "tb_dir", None))

    rng = jax.random.PRNGKey(opts.seed)
    rng, k_init, k_env = jax.random.split(rng, 3)
    dummy_obs = jnp.zeros((2,) + config.obs_shape, jnp.float32)
    variables = net.init(k_init, dummy_obs, train=False)
    variables = dict(variables)  # unfreeze container shape
    env_states, obs = venv.reset(k_env)
    st = NAFState(
        variables=variables,
        target_variables=jax.tree.map(jnp.copy, variables),
        opt=tx.init(variables["params"]),
        replay=replay_mod.create(
            opts.replay_capacity, config.obs_shape, (2,),
            obs_dtype=jnp.uint8 if config.use_raw_pixels else jnp.float32,
            block=common.replay_block(opts, venv.num_envs),
        ),
        env_states=env_states,
        obs=obs,
        ou_noise=ou_init((venv.num_envs, 2)),
        rng=rng,
        env_steps=jnp.zeros((), jnp.int32),
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
                                    eval_venv, greedy_act(net), st.variables)

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
            local_venv, net, tx,
            gamma=opts.gamma, tau=opts.tau,
            batch_size=opts.batch_size // opts.num_devices or 1,
            warmup_steps=opts.warmup_steps,
            steps_per_segment=opts.steps_per_segment,
            ou_theta=opts.ou_theta, ou_sigma=opts.ou_sigma,
            ou_sigma_min=opts.ou_sigma_min,
            ou_decay_steps=opts.ou_decay_steps,
            reward_scale=opts.reward_scale,
            axis_name=mesh.axis_names[0],
        )
        segment, shard_state = make_distributed(
            mesh, per_chip, st, NAF_SHARDED_FIELDS, NAF_METRIC_KEYS
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
                venv, net, tx,
                gamma=opts.gamma, tau=opts.tau, batch_size=opts.batch_size,
                warmup_steps=opts.warmup_steps,
                steps_per_segment=opts.steps_per_segment,
                ou_theta=opts.ou_theta, ou_sigma=opts.ou_sigma,
                ou_sigma_min=opts.ou_sigma_min,
                ou_decay_steps=opts.ou_decay_steps,
                reward_scale=opts.reward_scale,
            ),
            donate_argnums=0,
        )
    eval_fn = jax.jit(
        lambda v, k: common.eval_rollout(eval_venv, greedy_act(net), v, k)
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
            eval_params = (common.host_fetch(st.variables)
                           if multiproc else st.variables)
            elen, erew = eval_fn(eval_params, k_eval)
            final_eval = float(elen)
            best_keeper.update(i + 1, final_eval, st)
            logger.log(
                "train",
                segment=i + 1,
                env_steps=int(st.env_steps) * venv.num_envs,
                loss=float(metrics["loss"]),
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
    tail_params = (common.host_fetch(st.variables)
                   if multiproc and needs_tail else st.variables)
    if opts.event_log_out:
        # Reference README-GIF evidence path (SURVEY.md §6): greedy eval
        # episodes → event log; GIFs via utils.event_log --gif-out.
        lens = common.record_eval_episodes(
            config, greedy_act(net), tail_params,
            opts.event_log_out, seed=opts.seed,
            raster=getattr(opts, "render_raster", False),
        )
        logger.log("event_log", episodes=len(lens), lengths=lens)
    common.maybe_export_policy(opts, config, greedy_act(net), tail_params,
                               logger)
    logger.close()
    return final_eval


def main(argv=None):
    parser = common.make_parser(
        "NAF agent on cartpole++ (TPU rebuild of naf_cartpole.py)"
    )
    add_naf_opts(parser)
    opts = parser.parse_args(argv)
    common.maybe_init_multihost(opts, supported=True)
    print(f"OPTS {vars(opts)}", file=sys.stderr)
    train(opts)


if __name__ == "__main__":
    # Re-enter through the canonical module: under ``python -m`` this file
    # executes as __main__, and flax dataclasses defined here would register
    # as DIFFERENT pytree node types than the ones other modules import
    # (breaking e.g. the distributed path's tree_maps).
    from cartpoleplusplus_tpu.agents.naf import main as _main

    _main()
