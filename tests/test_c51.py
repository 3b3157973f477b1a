"""C51 distributional DQN (beyond-parity): projection math + learning smoke.

The projection is the scatter-free hat-matrix contraction
(agents/dqn._categorical_projection) — these tests pin it against the
Bellemare et al. (2017) semantics case by case.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cartpoleplusplus_tpu.agents import common, dqn
from cartpoleplusplus_tpu.models import QNetwork

Z = jnp.linspace(0.0, 10.0, 11)  # atoms at 0, 1, ..., 10


def test_projection_identity_when_support_maps_to_itself():
    p = jnp.array([[0.1, 0.0, 0.2, 0.0, 0.0, 0.3, 0.0, 0.0, 0.0, 0.0, 0.4]])
    m = dqn._categorical_projection(p, Z[None, :], Z)
    np.testing.assert_allclose(np.asarray(m), np.asarray(p), atol=1e-6)


def test_projection_splits_mass_between_neighbors():
    # All mass on one atom mapped to 2.25 → 75% to atom 2, 25% to atom 3.
    p = jnp.zeros((1, 11)).at[0, 4].set(1.0)
    tz = jnp.broadcast_to(jnp.full((11,), 5.0), (1, 11)).at[0, 4].set(2.25)
    m = dqn._categorical_projection(p, tz, Z)
    np.testing.assert_allclose(float(m[0, 2]), 0.75, atol=1e-6)
    np.testing.assert_allclose(float(m[0, 3]), 0.25, atol=1e-6)
    np.testing.assert_allclose(float(np.asarray(m).sum()), 1.0, rtol=1e-6)


def test_projection_clips_out_of_support_returns():
    p = jnp.full((1, 11), 1.0 / 11.0)
    m_low = dqn._categorical_projection(p, jnp.full((1, 11), -5.0), Z)
    m_high = dqn._categorical_projection(p, jnp.full((1, 11), 99.0), Z)
    np.testing.assert_allclose(float(m_low[0, 0]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(m_high[0, 10]), 1.0, rtol=1e-6)


def test_projection_preserves_total_mass():
    k = jax.random.PRNGKey(0)
    p = jax.nn.softmax(jax.random.normal(k, (64, 11)), axis=-1)
    tz = jax.random.uniform(jax.random.PRNGKey(1), (64, 11), minval=-3.0,
                            maxval=14.0)
    m = dqn._categorical_projection(p, tz, Z)
    np.testing.assert_allclose(np.asarray(m.sum(-1)), 1.0, rtol=1e-5)
    assert float(m.min()) >= 0.0


def test_c51_network_shapes_and_dueling_invariance():
    net = QNetwork(num_actions=5, hidden=(16, 16), dueling=True,
                   num_atoms=51)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((4, 7)))
    out = net.apply(params, jax.random.normal(jax.random.PRNGKey(1), (4, 7)))
    assert out.shape == (4, 5, 51)
    import flax

    shifted = flax.core.unfreeze(params)
    shifted["params"]["advantage"]["bias"] = (
        shifted["params"]["advantage"]["bias"] + 3.0
    )
    out2 = net.apply(shifted,
                     jax.random.normal(jax.random.PRNGKey(1), (4, 7)))
    # Per-atom mean subtraction over ACTIONS kills a uniform advantage
    # shift, exactly as in the scalar dueling head.
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_dqn_c51_rainbow_improves():
    """Full stack: C51 + PER + n-step 3 + dueling + double-q default, one
    fused segment, fixed-seed smoke gate (same harness as test_learning)."""
    parser = common.make_parser("t")
    dqn.add_dqn_opts(parser)
    opts = parser.parse_args([
        "--num-train-batches", "160", "--eps-decay-steps", "1000",
        "--c51", "51", "--c51-vmax", "8.0", "--reward-scale", "0.1",
        "--per", "--n-step", "3", "--dueling",
        "--num-envs", "32", "--num-eval", "32",
        "--action-repeats", "2", "--steps-per-repeat", "3",
        "--max-episode-len", "60", "--eval-freq", "20",
        "--steps-per-segment", "25", "--batch-size", "64",
        "--replay-capacity", "4096", "--warmup-steps", "10", "--seed", "0",
    ])
    final_eval = dqn.train(opts)
    assert final_eval > 12.0, f"C51 rainbow DQN did not learn: {final_eval}"
