"""First-divergence probe: the REAL jitted ddpg train segment, both backends.

The 2-cam samples=2 learning A/B flatlined under the raster backend while
every render-level probe (standalone kernels, static states) measures the
backends byte-identical.  Since the training program is deterministic given
the seed, ANY metric divergence between two same-seed runs that differ only
in ``render_raster`` must enter through the in-program render path — and it
must be visible within a handful of segments (the A/B's first logged row,
segment 500, already sat at double_reset 0.82 vs 0.29).

This probe builds the exact A/B training stack (same parser, same flags,
same jit + donation) for raster and slab, interleaves K segments, and
prints per-segment checksums of every moving part: metrics, actor params,
replay frame content, env poses.  The first row where a column differs
localizes the divergence to "render inside the fused train program".

Run on the chip (the Mosaic kernels only exist there); on CPU it uses
interpret mode via the agents' plumbing and should print all-equal rows.
"""

import json

import jax
import numpy as np

from cartpoleplusplus_tpu.agents import common, ddpg


AB_FLAGS = [
    "--use-raw-pixels", "--num-cameras", "2", "--obs-pool", "2",
    "--obs-samples", "2", "--pixel-encoder", "conv",
    "--num-envs", "512", "--num-eval", "8",
    "--steps-per-segment", "25", "--batch-size", "256",
    "--replay-capacity", "65536", "--warmup-steps", "40",
    "--num-train-batches", "8",
    "--actor-learning-rate", "1e-4", "--critic-learning-rate", "3e-4",
    "--lr-schedule", "cosine", "--reward-scale", "0.1", "--grad-clip", "10",
    "--aug-shift", "2", "--ou-sigma-min", "0.05",
    "--ou-decay-steps", "250000",
    "--twin-critic", "--policy-delay", "2", "--target-noise", "0.2",
    "--pallas-render", "--seed", "0",
]


def build_stack(render_raster: bool, envs: int):
    parser = common.make_parser("probe")
    ddpg.add_ddpg_opts(parser)
    opts = parser.parse_args(
        AB_FLAGS + ["--render-raster" if render_raster
                    else "--no-render-raster"])
    opts.num_envs = envs
    config = ddpg.config_from_opts(opts, discrete_actions=False)
    venv = common.make_venv(
        config, opts.num_envs, pallas_render=True,
        render_raster=render_raster,
        render_interpret=jax.default_backend() == "cpu",
    )
    actor = ddpg.Actor(action_dim=2, use_raw_pixels=True,
                       pixel_encoder=opts.pixel_encoder,
                       pixel_pool=opts.pixel_pool,
                       hidden=tuple(opts.hidden),
                       height=config.obs_height, width=config.obs_width,
                       use_batch_norm=opts.use_batch_norm)
    critic = ddpg.Critic(use_raw_pixels=True,
                         pixel_encoder=opts.pixel_encoder,
                         pixel_pool=opts.pixel_pool,
                         hidden=tuple(opts.hidden),
                         height=config.obs_height, width=config.obs_width,
                         use_batch_norm=opts.use_batch_norm)
    import optax

    def tx(base_lr):
        lr = common.make_lr(opts, base_lr)
        return optax.chain(optax.clip_by_global_norm(opts.grad_clip),
                           optax.adam(lr))

    actor_tx, critic_tx = tx(opts.actor_learning_rate), tx(
        opts.critic_learning_rate)
    st = ddpg.init_state(opts, config, venv, actor, critic, actor_tx,
                         critic_tx)
    segment = jax.jit(
        ddpg.make_segment(
            venv, actor, critic, actor_tx, critic_tx,
            gamma=opts.gamma, tau=opts.tau, batch_size=opts.batch_size,
            warmup_steps=opts.warmup_steps,
            steps_per_segment=opts.steps_per_segment,
            ou_theta=opts.ou_theta, ou_sigma=opts.ou_sigma,
            ou_sigma_min=opts.ou_sigma_min,
            ou_decay_steps=opts.ou_decay_steps,
            reward_scale=opts.reward_scale, aug_shift=opts.aug_shift,
            twin_critic=opts.twin_critic, policy_delay=opts.policy_delay,
            target_noise=opts.target_noise,
            target_noise_clip=opts.target_noise_clip,
            per_alpha=None, per_beta0=opts.per_beta0, per_eps=opts.per_eps,
            per_total_steps=opts.num_train_batches * opts.steps_per_segment,
            n_step=opts.n_step,
        ),
        donate_argnums=0,
    )
    return st, segment


def checksums(st) -> dict:
    out = {}
    leaves = jax.tree_util.tree_leaves(st.actor_params)
    out["actor_sum"] = float(sum(float(np.abs(np.asarray(x)).sum())
                                 for x in leaves))
    rep = st.replay
    out["replay_obs_sum"] = float(np.asarray(rep.s1, np.float64).sum())
    out["replay_rew_sum"] = round(float(np.asarray(rep.reward).sum()), 3)
    out["env_pos_sum"] = round(
        float(np.abs(np.asarray(st.env_states.rigid.pos)).sum()), 3)
    out["env_steps"] = int(st.env_steps)
    return out


def main():
    envs = 512 if jax.default_backend() != "cpu" else 32
    segs = 6
    stacks = {name: build_stack(name == "raster", envs)
              for name in ("raster", "slab")}
    for i in range(segs):
        row = {"segment": i + 1, "backend": jax.default_backend()}
        for name in stacks:
            st, segment = stacks[name]
            st, metrics = segment(st)
            stacks[name] = (st, segment)
            row[name] = {
                "reward": round(float(metrics["reward"]), 5),
                "double_reset": round(float(metrics["double_reset_frac"]),
                                      5),
                "critic_loss": round(float(metrics["critic_loss"]), 6),
                **{k: (round(v, 2) if isinstance(v, float) else v)
                   for k, v in checksums(st).items()},
            }
        a, b = row["raster"], row["slab"]
        row["equal"] = {k: bool(a[k] == b[k]) for k in a}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
