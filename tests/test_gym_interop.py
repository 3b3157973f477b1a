"""Third-party-stack interop over the gym wrapper.

The reference's keras-rl DQN (dqn_cartpole.py) proved BulletCartpole is a
compliant gym env for EXTERNAL agent libraries.  These tests prove the same
for the rebuild by driving agents/torch_dqn_demo.py — a PyTorch learner that
only touches the framework through env.gym_env.Cartpole.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from cartpoleplusplus_tpu.agents import torch_dqn_demo  # noqa: E402


def test_torch_dqn_trains_over_gym_wrapper():
    """A full external train loop (act/step/replay/backprop/target-sync)
    completes against the wrapper and returns a finite mean episode length."""
    mean_len = torch_dqn_demo.main([
        "--episodes", "6", "--batch-size", "16",
        "--eps-decay-episodes", "3", "--target-sync-steps", "50",
        "--action-repeats", "2", "--steps-per-repeat", "3",
        "--max-episode-len", "30", "--seed", "0",
    ])
    assert np.isfinite(mean_len)
    assert 1.0 <= mean_len <= 30.0


def test_gym_spaces_contract():
    """The wrapper exposes the space/step API shape external libs key on."""
    parser = __import__("argparse").ArgumentParser()
    from cartpoleplusplus_tpu.env import config as env_config

    env_config.add_opts(parser)
    opts = parser.parse_args(["--action-repeats", "2", "--steps-per-repeat", "2"])
    env = torch_dqn_demo.build_env(
        type("O", (), {**vars(opts), "seed": 0})()
    )
    assert hasattr(env.action_space, "n")
    obs = env.reset()
    assert obs.shape == env.observation_space.shape
    obs2, reward, done, info = env.step(env.action_space.sample())
    assert obs2.shape == env.observation_space.shape
    assert isinstance(reward, float) and isinstance(done, bool)
