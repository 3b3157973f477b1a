"""n-step returns + dueling head (beyond-parity DQN extensions).

n-step on the s2-free block replay is pure stride gathers (transition i's
k-th same-env successor is row i + k·block) — replay/buffer.py nstep_batch.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cartpoleplusplus_tpu.agents import common, dqn
from cartpoleplusplus_tpu.models import QNetwork
from cartpoleplusplus_tpu.replay import buffer as replay_mod


def _block_buffer(capacity=16, block=2, steps=8, term_at=()):
    """Fill a block-mode buffer: step t writes rewards (10t, 10t+1) for the
    two env slots; terminals at the (step, slot) pairs in ``term_at``."""
    r = replay_mod.create(capacity, (3,), (), block=block)
    for t in range(steps):
        rew = jnp.array([10.0 * t, 10.0 * t + 1.0])
        term = jnp.array([(t, s) in term_at for s in range(block)])
        obs = jnp.full((block, 3), float(t))
        r = replay_mod.add_batch(r, obs, jnp.zeros((block,)), rew, None, term)
    return r


def test_nstep_accumulates_rewards_with_discount():
    r = _block_buffer()
    gamma = 0.9
    # Transition at slot index 2 (= step 1, env 0): rewards 10, 20, 30.
    (s1, _, rn, s2, done) = replay_mod.nstep_batch(
        r, jnp.array([2]), n_step=3, gamma=gamma
    )
    np.testing.assert_allclose(
        float(rn[0]), 10.0 + gamma * 20.0 + gamma**2 * 30.0, rtol=1e-6
    )
    assert not bool(done[0])
    np.testing.assert_allclose(np.asarray(s1[0]), 1.0)  # step-1 obs
    np.testing.assert_allclose(np.asarray(s2[0]), 4.0)  # step-4 obs


def test_nstep_masks_rewards_past_terminal():
    # env 0 terminates at step 2: from step 1 the window sees r1, r2 and
    # must NOT include step 3's reward (next episode) nor bootstrap.
    r = _block_buffer(term_at={(2, 0)})
    gamma = 0.5
    (_, _, rn, _, done) = replay_mod.nstep_batch(
        r, jnp.array([2]), n_step=3, gamma=gamma
    )
    np.testing.assert_allclose(float(rn[0]), 10.0 + gamma * 20.0, rtol=1e-6)
    assert bool(done[0])
    # The terminal transition itself still counts its own reward.
    (_, _, rn2, _, done2) = replay_mod.nstep_batch(
        r, jnp.array([4]), n_step=3, gamma=gamma
    )
    np.testing.assert_allclose(float(rn2[0]), 20.0, rtol=1e-6)
    assert bool(done2[0])


def test_nstep_one_equals_plain_sample():
    r = _block_buffer()
    k = jax.random.PRNGKey(0)
    a = replay_mod.sample(r, k, 32, n_step=1, gamma=0.9)
    b = replay_mod.sample(r, k, 32)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_nstep_sampling_excludes_newest_n_blocks():
    r = _block_buffer(capacity=16, steps=8)  # full ring, cursor wrapped to 0
    idx = np.asarray(
        replay_mod.sample(r, jax.random.PRNGKey(1), 4096, n_step=3,
                          gamma=0.9)[0]
    )
    # With the ring full, valid offsets from the cursor span size - 3·block
    # = 10 slots; the newest 3 blocks (steps 5,6,7 → slots 10..15) must
    # never appear as a SAMPLED transition start.
    starts = np.asarray(
        replay_mod.sample(r, jax.random.PRNGKey(1), 4096, n_step=3,
                          gamma=0.9)[0]
    )  # obs encode step number
    assert starts.max() <= 4.0  # step-4 obs = newest sampleable start


def test_nstep_prioritized_path_matches_uniform_fields():
    r = _block_buffer()
    r = r.replace(priority=jnp.ones((16,)))
    (batch, idx, iw) = replay_mod.sample_prioritized(
        r, jax.random.PRNGKey(2), 64, alpha=0.6, beta=1.0,
        n_step=2, gamma=0.8,
    )
    np.testing.assert_allclose(np.asarray(iw), 1.0, rtol=1e-6)
    ref = replay_mod.nstep_batch(r, idx, 2, 0.8)
    for x, y in zip(batch, ref):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_dueling_head_identifiable_and_shaped():
    net = QNetwork(num_actions=5, hidden=(16, 16), dueling=True)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((4, 7)))
    q = net.apply(params, jax.random.normal(jax.random.PRNGKey(1), (4, 7)))
    assert q.shape == (4, 5)
    assert "value" in params["params"] and "advantage" in params["params"]
    # Identifiability: the mean subtraction makes Q invariant to a constant
    # shift of the advantage stream (that's the point of the decomposition).
    import flax

    shifted = flax.core.unfreeze(params)
    shifted["params"]["advantage"]["bias"] = (
        shifted["params"]["advantage"]["bias"] + 1.0
    )
    q2 = net.apply(shifted,
                   jax.random.normal(jax.random.PRNGKey(1), (4, 7)))
    np.testing.assert_allclose(np.asarray(q), np.asarray(q2), atol=1e-6)


def test_dqn_rainbow_lite_improves():
    """double-Q (default) + PER + n-step 3 + dueling, all in one fused
    segment — the beyond-parity 'rainbow-lite' configuration learns on the
    fixed-seed smoke budget."""
    parser = common.make_parser("t")
    dqn.add_dqn_opts(parser)
    opts = parser.parse_args([
        "--num-train-batches", "160", "--eps-decay-steps", "1000",
        "--per", "--n-step", "3", "--dueling",
        "--num-envs", "32", "--num-eval", "32",
        "--action-repeats", "2", "--steps-per-repeat", "3",
        "--max-episode-len", "60", "--eval-freq", "20",
        "--steps-per-segment", "25", "--batch-size", "64",
        "--replay-capacity", "4096", "--warmup-steps", "10", "--seed", "0",
    ])
    final_eval = dqn.train(opts)
    assert final_eval > 12.0, f"rainbow-lite DQN did not learn: {final_eval}"


def test_ddpg_per_nstep_improves():
    """DDPG with PER + 3-step returns on the shared smoke budget (the
    continuous-control flagship gets the same replay extensions as DQN)."""
    from cartpoleplusplus_tpu.agents import ddpg

    parser = common.make_parser("t")
    ddpg.add_ddpg_opts(parser)
    opts = parser.parse_args([
        "--num-train-batches", "60", "--reward-scale", "0.1",
        "--grad-clip", "10.0", "--per", "--n-step", "3",
        "--num-envs", "32", "--num-eval", "32",
        "--action-repeats", "2", "--steps-per-repeat", "3",
        "--max-episode-len", "60", "--eval-freq", "20",
        "--steps-per-segment", "25", "--batch-size", "64",
        "--replay-capacity", "4096", "--warmup-steps", "10", "--seed", "0",
    ])
    final_eval = ddpg.train(opts)
    assert final_eval > 12.0, f"PER/n-step DDPG did not learn: {final_eval}"


def test_nstep_rejects_degenerate_capacity():
    """capacity < (n_step+1) blocks is a hard error: the valid-window clamp
    would otherwise silently sample rows whose n-step successor is unwritten
    zeros — or, at capacity == n_step*block, the row ITSELF (the stride
    gather wraps the full ring), bootstrapping every TD target from its own
    state (round-4c review finding)."""
    import pytest

    parser = common.make_parser("t")
    dqn.add_dqn_opts(parser)
    opts = parser.parse_args([
        "--n-step", "2", "--num-envs", "4", "--replay-capacity", "8",
        "--num-train-batches", "1", "--num-eval", "4",
        "--action-repeats", "2", "--steps-per-repeat", "2",
        "--max-episode-len", "10", "--steps-per-segment", "2",
        "--batch-size", "4", "--warmup-steps", "1",
    ])
    with pytest.raises(SystemExit, match="needs replay capacity"):
        dqn.train(opts)
