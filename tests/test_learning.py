"""Fixed-seed learning smoke tests (SURVEY.md §4: "does it learn" bounds).

Full time-to-solve runs live on TPU (runs/*.jsonl); these CPU tests assert
the cheaper invariant that a short budget of updates IMPROVES the policy
beyond its initial performance on a fixed seed — catching sign errors,
broken masking, and dead gradients.
"""

import jax

from cartpoleplusplus_tpu.agents import common, ddpg, dqn, lrpg, naf

# Shared tiny-budget flags for the off-policy smoke runs: 32 envs, short
# 60-step episodes, ~50k env transitions.  An untrained/random policy
# evals at ~7-8 steps on this horizon (BASELINE.md nop baseline), so the
# thresholds below assert a ~2× improvement with margin under the
# calibrated results (DDPG 22.4, NAF 23.3, DQN 34.4 on seed 0).
_SMOKE = [
    "--num-envs", "32", "--num-eval", "32",
    "--action-repeats", "2", "--steps-per-repeat", "3",
    "--max-episode-len", "60", "--eval-freq", "20",
    "--steps-per-segment", "25", "--batch-size", "64",
    "--replay-capacity", "4096", "--warmup-steps", "10", "--seed", "0",
]


def test_ddpg_improves():
    parser = common.make_parser("t")
    ddpg.add_ddpg_opts(parser)
    opts = parser.parse_args(
        ["--num-train-batches", "60", "--reward-scale", "0.1",
         "--grad-clip", "10.0", *_SMOKE]
    )
    final_eval = ddpg.train(opts)
    assert final_eval > 12.0, f"DDPG did not learn: eval len {final_eval}"


def test_naf_improves():
    parser = common.make_parser("t")
    naf.add_naf_opts(parser)
    opts = parser.parse_args(
        ["--num-train-batches", "60", "--reward-scale", "0.1",
         "--grad-clip", "10.0", *_SMOKE]
    )
    final_eval = naf.train(opts)
    assert final_eval > 12.0, f"NAF did not learn: eval len {final_eval}"


def test_dqn_improves():
    parser = common.make_parser("t")
    dqn.add_dqn_opts(parser)
    opts = parser.parse_args(
        ["--num-train-batches", "80", "--eps-decay-steps", "1000", *_SMOKE]
    )
    final_eval = dqn.train(opts)
    assert final_eval > 15.0, f"DQN did not learn: eval len {final_eval}"


def test_lrpg_improves(tmp_path):
    parser = common.make_parser("t")
    opts = parser.parse_args([
        "--num-train-batches", "30", "--num-envs", "32", "--num-eval", "32",
        "--action-repeats", "2", "--steps-per-repeat", "3",
        "--max-episode-len", "60", "--eval-freq", "30",
        "--learning-rate", "3e-3", "--seed", "0",
    ])
    config = __import__(
        "cartpoleplusplus_tpu.env.config", fromlist=["config_from_opts"]
    ).config_from_opts(opts, discrete_actions=True)

    venv = common.make_venv(config, opts.num_envs)
    policy = __import__(
        "cartpoleplusplus_tpu.models", fromlist=["DiscretePolicy"]
    ).DiscretePolicy(num_actions=5, hidden=(32, 32))
    import jax.numpy as jnp
    import optax

    rng = jax.random.PRNGKey(0)
    params = policy.init(rng, jnp.zeros((1,) + config.obs_shape))
    tx = optax.adam(opts.learning_rate)
    ts = lrpg.TrainState(
        params=params, opt_state=tx.init(params), rng=rng,
        update=jnp.zeros((), jnp.int32),
    )
    step = jax.jit(lrpg.make_train_step(venv, policy, tx, 0.99), donate_argnums=0)

    lens = []
    for i in range(50):
        ts, metrics = step(ts)
        lens.append(float(metrics["ep_len"]))
    # Noisy REINFORCE: compare 5-update means at the ends (measured ~23→29
    # on this seed; threshold leaves margin for numeric drift).
    first = sum(lens[:5]) / 5.0
    last = sum(lens[-5:]) / 5.0
    assert last > first + 2.0, f"no learning: {first:.1f} -> {last:.1f}"
