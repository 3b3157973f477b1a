"""Prioritized replay (PER) — TPU-native sampler unit tests + DQN smoke.

The reference has no PER (beyond-parity feature); the implementation under
test is replay/buffer.py's masked-cumsum + vectorized-searchsorted inverse
CDF — the sum-tree-free formulation that stays inside the fused jit.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cartpoleplusplus_tpu.agents import common, dqn
from cartpoleplusplus_tpu.replay import buffer as replay_mod


def _filled(capacity=8, n=8, block=0, prioritized=True):
    r = replay_mod.create(capacity, (3,), (), block=block,
                          prioritized=prioritized)
    for i in range(0, n, max(block, 1)):
        b = max(block, 1)
        obs = jnp.full((b, 3), float(i))
        r = replay_mod.add_batch(
            r, obs, jnp.zeros((b,)), jnp.full((b,), float(i)),
            None if block else obs + 0.5, jnp.zeros((b,), bool),
        )
    return r


def test_insert_stamps_max_priority():
    r = _filled(n=4)
    # Correct two rows' priorities, then insert: the new row must enter at
    # the running max (2.0), not at 1.0.
    r = replay_mod.update_priorities(r, jnp.array([0, 1]),
                                     jnp.array([1.99, 0.09]), eps=0.01)
    r = replay_mod.add_batch(
        r, jnp.zeros((1, 3)), jnp.zeros((1,)), jnp.zeros((1,)),
        jnp.zeros((1, 3)), jnp.zeros((1,), bool),
    )
    np.testing.assert_allclose(float(r.priority[4]), 2.0)


def test_proportional_sampling_frequencies():
    r = _filled(capacity=8, n=8)
    pri = jnp.array([8.0, 4.0, 2.0, 1.0, 1.0, 1.0, 1.0, 1.0])
    r = r.replace(priority=pri)
    alpha = 1.0
    draws = 40000
    _, idx, _ = replay_mod.sample_prioritized(
        r, jax.random.PRNGKey(0), draws, alpha, beta=0.0
    )
    counts = np.bincount(np.asarray(idx), minlength=8).astype(np.float64)
    expect = np.asarray(pri) / np.sum(np.asarray(pri))
    np.testing.assert_allclose(counts / draws, expect, atol=0.01)


def test_importance_weights_match_probabilities():
    r = _filled(capacity=8, n=8)
    pri = jnp.arange(1.0, 9.0)
    r = r.replace(priority=pri)
    alpha, beta = 0.7, 1.0
    _, idx, iw = replay_mod.sample_prioritized(
        r, jax.random.PRNGKey(1), 512, alpha, beta
    )
    w = np.asarray(pri) ** alpha
    p = w / w.sum()
    expected = (8 * p[np.asarray(idx)]) ** (-beta)
    expected = expected / expected.max()
    np.testing.assert_allclose(np.asarray(iw), expected, rtol=1e-5)
    assert float(jnp.max(iw)) <= 1.0 + 1e-6


def test_uniform_priorities_give_unit_weights():
    r = _filled(capacity=8, n=8)
    _, _, iw = replay_mod.sample_prioritized(
        r, jax.random.PRNGKey(2), 64, 0.6, beta=1.0
    )
    np.testing.assert_allclose(np.asarray(iw), 1.0, rtol=1e-6)


def test_alpha_zero_is_uniform_over_valid_only():
    # Half-filled buffer + alpha=0: every VALID slot equally likely, no
    # invalid slot ever drawn (guards the 0**0 == 1 masking trap).
    r = _filled(capacity=16, n=8)
    r = r.replace(priority=r.priority.at[:8].set(
        jnp.array([9.0, 1.0, 5.0, 1.0, 1.0, 1.0, 1.0, 1.0])))
    _, idx, _ = replay_mod.sample_prioritized(
        r, jax.random.PRNGKey(3), 20000, 0.0, beta=0.5
    )
    idx = np.asarray(idx)
    assert idx.max() < 8
    counts = np.bincount(idx, minlength=8) / 20000
    np.testing.assert_allclose(counts, 1.0 / 8.0, atol=0.02)


def test_s2free_excludes_newest_block():
    # Block mode: the newest block may NEVER be drawn, even at max priority.
    r = _filled(capacity=8, n=8, block=2)
    assert r.block == 2
    r = r.replace(priority=r.priority.at[6:8].set(1e6))
    _, idx, _ = replay_mod.sample_prioritized(
        r, jax.random.PRNGKey(4), 4096, 1.0, beta=0.0
    )
    idx = np.asarray(idx)
    # cursor wrapped to 0 after 8 inserts at capacity 8 → newest block is
    # slots {6, 7} (cursor - block mod cap).
    assert not np.isin(idx, [6, 7]).any()


def test_priority_survives_sample_jit_and_updates():
    r = _filled(capacity=8, n=8)

    @jax.jit
    def step(r, key):
        batch, idx, iw = replay_mod.sample_prioritized(r, key, 4, 0.6, 0.4)
        td = jnp.abs(batch[2])  # reward magnitude as a stand-in TD error
        return replay_mod.update_priorities(r, idx, td), idx

    r2, idx = step(r, jax.random.PRNGKey(5))
    idx = np.asarray(idx)
    got = np.asarray(r2.priority)[idx]
    want = np.abs(np.asarray(r.reward)[idx]) + 1e-2
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_dqn_per_improves():
    """End-to-end: --per DQN still learns on the fixed-seed smoke budget
    (same harness as tests/test_learning.py; gate is the shared 'policy
    improves ~2x over random' bar, not a PER-vs-uniform claim)."""
    parser = common.make_parser("t")
    dqn.add_dqn_opts(parser)
    opts = parser.parse_args([
        "--num-train-batches", "160", "--eps-decay-steps", "1000", "--per",
        "--num-envs", "32", "--num-eval", "32",
        "--action-repeats", "2", "--steps-per-repeat", "3",
        "--max-episode-len", "60", "--eval-freq", "20",
        "--steps-per-segment", "25", "--batch-size", "64",
        "--replay-capacity", "4096", "--warmup-steps", "10", "--seed", "0",
    ])
    final_eval = dqn.train(opts)
    assert final_eval > 12.0, f"PER DQN did not learn: eval len {final_eval}"
