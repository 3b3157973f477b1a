"""PPO agent (beyond-parity on-policy actor-critic, agents/ppo.py).

Contract + numerics tests; the learning evidence lives in
runs/ppo_lowdim_cpu_s0.jsonl (BASELINE.md round 4) and the learning gate in
tests/test_learning.py style is intentionally not duplicated here — PPO's
per-update cost (epochs × minibatches) makes a CI-scale gate too noisy.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from cartpoleplusplus_tpu.agents import common
from cartpoleplusplus_tpu.agents import ppo
from cartpoleplusplus_tpu.utils import checkpoint as ckpt


def _opts(extra=()):
    parser = common.make_parser("t")
    ppo.add_ppo_opts(parser)
    return parser.parse_args([
        "--num-envs", "8", "--num-eval", "4", "--eval-freq", "1",
        "--action-repeats", "2", "--steps-per-repeat", "2",
        "--max-episode-len", "10", "--rollout-steps", "8",
        "--ppo-minibatches", "2", "--ppo-epochs", "2",
        "--num-train-batches", "2", "--seed", "0",
    ] + list(extra))


def test_tanh_gaussian_logp_matches_sac_sampler():
    """The stored-u logp must equal the sampling-time logp SAC computes
    (same tanh change-of-variables identity, different parameterization)."""
    from cartpoleplusplus_tpu.agents.sac import sample_action
    from cartpoleplusplus_tpu.models import GaussianActor

    actor = GaussianActor(action_dim=2, hidden=(16,))
    obs = jax.random.normal(jax.random.PRNGKey(0), (32, 14))
    params = actor.init(jax.random.PRNGKey(1), obs)
    a, logp_sac = sample_action(actor, params, obs, jax.random.PRNGKey(2))

    mu, log_std = actor.apply(params, obs)
    eps = jax.random.normal(jax.random.PRNGKey(2), mu.shape)
    u = mu + jnp.exp(log_std) * eps
    np.testing.assert_allclose(np.tanh(np.asarray(u)), np.asarray(a), rtol=1e-6)
    logp = ppo.tanh_gaussian_logp(mu, log_std, u)
    np.testing.assert_allclose(
        np.asarray(logp), np.asarray(logp_sac), rtol=2e-5, atol=2e-5
    )


def test_ppo_smoke_trains_and_evals():
    final = ppo.train(_opts())
    assert np.isfinite(final) and final > 0.0


def test_ppo_minibatch_divisibility_guard():
    import pytest

    with pytest.raises(SystemExit):
        ppo.make_train_step(
            common.make_venv(
                __import__(
                    "cartpoleplusplus_tpu.env.config", fromlist=["CartpoleConfig"]
                ).CartpoleConfig(), 8,
            ),
            None, None, None, _opts(["--ppo-minibatches", "7"]),
        )


def test_ppo_resume(tmp_path):
    def opts(n):
        return _opts(["--ckpt-dir", str(tmp_path), "--ckpt-freq", "1",
                      "--num-train-batches", str(n)])

    ppo.train(opts(2))
    assert ckpt.latest_step(str(tmp_path)) == 2
    raw = ckpt.load_raw(str(tmp_path), 2)
    assert int(raw["update"]) == 2

    ppo.train(opts(4))
    assert ckpt.latest_step(str(tmp_path)) == 4
    assert int(ckpt.load_raw(str(tmp_path), 4)["update"]) == 4
