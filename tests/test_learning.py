"""Fixed-seed learning smoke tests (SURVEY.md §4: "does it learn" bounds).

Full time-to-solve runs live on TPU (runs/*.jsonl); these CPU tests assert
the cheaper invariant that a short budget of updates IMPROVES the policy
beyond its initial performance on a fixed seed — catching sign errors,
broken masking, and dead gradients.
"""

import jax

from cartpoleplusplus_tpu.agents import common, ddpg, lrpg


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
