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


def test_gym_env_from_opts_namespace():
    """The reference pattern ``env = BulletCartpole(opts)`` (ddpg_cartpole.py
    :~L280) works with a raw add_opts Namespace, including pixel obs —
    round 4 fix: the wrapper previously required a CartpoleConfig, and
    --use-raw-pixels silently fell back to low-dim poses."""
    import argparse

    from cartpoleplusplus_tpu.env.gym_env import BulletCartpole, add_opts

    parser = argparse.ArgumentParser()
    add_opts(parser)
    opts = parser.parse_args(
        ["--use-raw-pixels", "--action-repeats", "2", "--steps-per-repeat", "2",
         "--render-width", "20", "--render-height", "20"]
    )
    env = BulletCartpole(opts)
    assert env.config.use_raw_pixels
    obs = env.reset()
    assert obs.shape == env.observation_space.shape
    assert obs.dtype == np.uint8 == env.observation_space.dtype
    assert obs.max() > 100  # rendered pixels, not poses
    obs2, reward, done, info = env.step(env.action_space.sample())
    assert obs2.shape == obs.shape and obs2.dtype == np.uint8

    lowdim = BulletCartpole(parser.parse_args(
        ["--action-repeats", "2", "--steps-per-repeat", "2"]))
    o = lowdim.reset()
    assert o.shape == (2, 2, 7) and o.dtype == np.float32


def test_gym_render_rgb_array():
    """env.render() returns an (H, W, 3) uint8 image of the live state
    (reference --gui analogue; was a NotImplementedError in round 1)."""
    import numpy as np

    from cartpoleplusplus_tpu.env import Cartpole, CartpoleConfig

    env = Cartpole(CartpoleConfig(render_width=32, render_height=32))
    env.reset()
    img = env.render()
    assert img.shape == (32, 32, 3)
    assert img.dtype == np.uint8
    assert img.max() > 100  # scene visible, not a black frame
    env.step(env.action_space.sample())
    img2 = env.render(mode="human")
    assert img2.shape == (32, 32, 3)
