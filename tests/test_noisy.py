"""NoisyNet heads (Rainbow component 6/6): layer math + full-stack smoke."""

import jax
import jax.numpy as jnp
import numpy as np

from cartpoleplusplus_tpu.agents import common, dqn
from cartpoleplusplus_tpu.models import NoisyDense, QNetwork


def test_noisy_dense_deterministic_is_mu_linear():
    layer = NoisyDense(4)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 3))
    params = layer.init(jax.random.PRNGKey(1), x)
    out = layer.apply(params, x, deterministic=True)
    mu_out = x @ params["params"]["kernel"] + params["params"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(mu_out),
                               rtol=1e-6)
    assert "kernel_sigma" in params["params"]


def test_noisy_dense_noise_is_keyed_and_nonzero():
    layer = NoisyDense(4)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 3))
    params = layer.init(jax.random.PRNGKey(1), x)
    a = layer.apply(params, x, deterministic=False,
                    rngs={"noise": jax.random.PRNGKey(2)})
    b = layer.apply(params, x, deterministic=False,
                    rngs={"noise": jax.random.PRNGKey(3)})
    a2 = layer.apply(params, x, deterministic=False,
                     rngs={"noise": jax.random.PRNGKey(2)})
    det = layer.apply(params, x, deterministic=True)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a2))
    assert not np.allclose(np.asarray(a), np.asarray(det))


def test_noisy_qnetwork_eval_path_needs_no_rng():
    net = QNetwork(num_actions=5, hidden=(16, 16), noisy=True, dueling=True,
                   num_atoms=11)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 7)))
    out = net.apply(params, jnp.zeros((2, 7)))  # noise=False default
    assert out.shape == (2, 5, 11)
    noisy_out = net.apply(params, jnp.zeros((2, 7)), noise=True,
                          rngs={"noise": jax.random.PRNGKey(1)})
    assert not np.allclose(np.asarray(out), np.asarray(noisy_out))


def test_dqn_full_rainbow_improves():
    """All six Rainbow components in one fused segment: double-q default +
    PER + n-step + dueling + C51 + NoisyNet (eps forced to 0)."""
    parser = common.make_parser("t")
    dqn.add_dqn_opts(parser)
    opts = parser.parse_args([
        "--num-train-batches", "160", "--noisy",
        "--c51", "51", "--c51-vmax", "8.0", "--reward-scale", "0.1",
        "--per", "--n-step", "3", "--dueling",
        "--num-envs", "32", "--num-eval", "32",
        "--action-repeats", "2", "--steps-per-repeat", "3",
        "--max-episode-len", "60", "--eval-freq", "20",
        "--steps-per-segment", "25", "--batch-size", "64",
        "--replay-capacity", "4096", "--warmup-steps", "10", "--seed", "0",
    ])
    final_eval = dqn.train(opts)
    assert final_eval > 12.0, f"full-rainbow DQN did not learn: {final_eval}"
