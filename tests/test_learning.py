"""Fixed-seed learning smoke tests (SURVEY.md §4: "does it learn" bounds).

Full time-to-solve runs live on TPU (runs/*.jsonl); these CPU tests assert
the cheaper invariant that a short budget of updates IMPROVES the policy
beyond its initial performance on a fixed seed — catching sign errors,
broken masking, and dead gradients.
"""

import jax

from cartpoleplusplus_tpu.agents import common, ddpg, dqn, lrpg, naf, sac

# Shared tiny-budget flags for the off-policy smoke runs: 32 envs, short
# 60-step episodes, ~50k env transitions.  An untrained/random policy
# evals at ~7-8 steps on this horizon (BASELINE.md nop baseline), so the
# thresholds below assert a ~2× improvement with margin under the
# calibrated results (DDPG 27.4, NAF 18.7, DQN 52.8@160 on seed 0).
# NOTE: these short-budget curves are chaotic — a rounding-level physics
# change (e.g. the round-3 column-sum corner reassociation, 743c766)
# legitimately shifts them by 2×; when one drifts below its gate,
# re-calibrate budget/threshold here AFTER confirming the physics
# equivalence + MuJoCo fidelity suites still pass (those pin correctness;
# this file only pins "gradient flows and the policy improves").
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


def test_sac_improves():
    """Beyond-parity agent: max-entropy SAC on the same fused loop.
    Calibrated seed-0 result: eval 21.3 at segment 20, 17.1 at 60, with the
    temperature auto-tuning downward (0.087 → 0.064) — gate well below."""
    parser = common.make_parser("t")
    sac.add_sac_opts(parser)
    opts = parser.parse_args(
        ["--num-train-batches", "60", "--reward-scale", "0.1",
         "--grad-clip", "10.0", *_SMOKE]
    )
    final_eval = sac.train(opts)
    assert final_eval > 12.0, f"SAC did not learn: eval len {final_eval}"


def test_dqn_improves():
    parser = common.make_parser("t")
    dqn.add_dqn_opts(parser)
    opts = parser.parse_args(
        ["--num-train-batches", "160", "--eps-decay-steps", "1000", *_SMOKE]
    )
    final_eval = dqn.train(opts)
    assert final_eval > 30.0, f"DQN did not learn: eval len {final_eval}"


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


def test_same_seed_bitwise_deterministic():
    """Two fused DDPG segments from identical seeds produce bit-identical
    states and metrics — the rebuild's determinism guarantee (SURVEY §5:
    no races to detect in a single compiled program; seeds pin everything)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from cartpoleplusplus_tpu.agents import common, ddpg as ddpg_mod
    from cartpoleplusplus_tpu.env.config import CartpoleConfig
    from cartpoleplusplus_tpu.models import Actor, Critic

    config = CartpoleConfig(
        discrete_actions=False, action_repeats=2, steps_per_repeat=2,
        initial_force_steps=2, max_episode_len=20,
    )
    venv = common.make_venv(config, 16)
    actor = Actor(action_dim=2, hidden=(16, 16))
    critic = Critic(hidden=(16, 16))
    atx, ctx = optax.adam(1e-3), optax.adam(1e-3)
    opts = type("O", (), {"seed": 7, "replay_capacity": 256})()

    def run():
        st = ddpg_mod.init_state(opts, config, venv, actor, critic, atx, ctx)
        seg = jax.jit(ddpg_mod.make_segment(
            venv, actor, critic, atx, ctx,
            gamma=0.99, tau=0.01, batch_size=8, warmup_steps=2,
            steps_per_segment=6, ou_theta=0.15, ou_sigma=0.2,
        ))
        for _ in range(3):
            st, metrics = seg(st)
        return st, metrics

    st1, m1 = run()
    st2, m2 = run()
    for a, b in zip(jax.tree.leaves(st1), jax.tree.leaves(st2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(m1["reward"]) == float(m2["reward"])


# ---------------------------------------------------------------------------
# Regression-grade mid-curve gates (VERDICT r2 weak #5): the smoke tests
# above catch "doesn't learn at all"; these catch "solves at 200 regressed
# to limping at 60".  Budgets are ~1-3 min each on the CPU mesh; thresholds
# sit well under the calibrated seed-0 curves (margins noted inline) but
# far above any broken-learning plateau.
# ---------------------------------------------------------------------------

def _eval_curve(path):
    import json

    with open(path) as f:
        rows = [json.loads(l) for l in f if "eval_ep_len" in l]
    return [r["eval_ep_len"] for r in rows]


def test_ddpg_midcurve_gate(tmp_path):
    """Calibrated seed-0 curve (segment 40..200, eval every 40):
    27.9 / 29.7 / 44.1 / 57.6 / 42.5.  Gate: best eval >= 38 — a policy
    that stalls below ~2/3 of the 60-step horizon fails."""
    from cartpoleplusplus_tpu.agents import common, ddpg

    parser = common.make_parser("t")
    ddpg.add_ddpg_opts(parser)
    jsonl = str(tmp_path / "m.jsonl")
    opts = parser.parse_args(
        [*_SMOKE, "--num-train-batches", "200", "--reward-scale", "0.1",
         "--grad-clip", "10.0", "--eval-freq", "40",
         "--metrics-jsonl", jsonl]
    )
    ddpg.train(opts)
    evals = _eval_curve(jsonl)
    assert max(evals) >= 38.0, f"DDPG mid-curve regression: {evals}"


def test_td3_ddpg_improves(tmp_path):
    """The TD3 stabilizer stack (twin critics + delayed policy + target
    smoothing) still learns: calibrated seed-0 curve 21.8 / 22.4 / 13.8 /
    31.8 / 51.3 — slower early than plain DDPG (conservative min-Q targets)
    but climbing.  Gate: best eval >= 28."""
    from cartpoleplusplus_tpu.agents import common, ddpg

    parser = common.make_parser("t")
    ddpg.add_ddpg_opts(parser)
    jsonl = str(tmp_path / "m.jsonl")
    opts = parser.parse_args(
        [*_SMOKE, "--num-train-batches", "200", "--reward-scale", "0.1",
         "--grad-clip", "10.0", "--eval-freq", "40",
         "--twin-critic", "--policy-delay", "2", "--target-noise", "0.2",
         "--metrics-jsonl", jsonl]
    )
    ddpg.train(opts)
    evals = _eval_curve(jsonl)
    assert max(evals) >= 28.0, f"TD3-DDPG regression: {evals}"


def test_dqn_midcurve_gate(tmp_path):
    """Calibrated seed-0 curve (segment 50..250, eval every 50, double-Q):
    14.3 / 24.5 / 40.9 / 56.2 / 57.3.  Gate: best eval >= 40."""
    from cartpoleplusplus_tpu.agents import common, dqn

    parser = common.make_parser("t")
    dqn.add_dqn_opts(parser)
    jsonl = str(tmp_path / "m.jsonl")
    opts = parser.parse_args(
        [*_SMOKE, "--num-train-batches", "250", "--eps-decay-steps", "2000",
         "--double-q", "--eval-freq", "50", "--metrics-jsonl", jsonl]
    )
    dqn.train(opts)
    evals = _eval_curve(jsonl)
    assert max(evals) >= 40.0, f"DQN mid-curve regression: {evals}"


def test_sac_alpha_floor_clamps(tmp_path):
    """--alpha-min: the learned temperature never drops below the floor
    (the round-4 chip run collapsed 200→83 as α annealed to ~8e-4 with the
    critic lr still hot; the floor is the SAC analogue of the OU σ floor)."""
    import json

    parser = common.make_parser("t")
    sac.add_sac_opts(parser)
    jsonl = str(tmp_path / "sac.jsonl")
    opts = parser.parse_args([
        "--num-train-batches", "6", "--eval-freq", "2",
        "--init-alpha", "0.05", "--alpha-min", "0.5",
        "--metrics-jsonl", jsonl, *_SMOKE,
    ])
    sac.train(opts)
    alphas = [
        json.loads(l)["alpha"] for l in open(jsonl)
        if json.loads(l).get("event") == "train"
    ]
    # Pre-warmup segments report alpha=0 (zero_metrics); every trained
    # segment must sit at/above the floor despite starting far below it.
    trained = [a for a in alphas if a > 0.0]
    assert trained, "no trained segments logged"
    assert min(trained) >= 0.5 - 1e-6, f"alpha floor violated: {trained}"
