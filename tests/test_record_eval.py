"""record_eval_episodes (the README-GIF artifact path, SURVEY.md §6).

Previously exercised only via agent CLIs; this pins it directly in CI:
greedy-policy episodes land in an event log the fidelity harness can
re-simulate BIT-EXACTLY (the artifact run's whole value), for both the
low-dim and pixel+raster observation pipelines, with trained params passed
as jit arguments (the tunnel-safe calling convention — see CLAUDE.md).
"""

import jax
import jax.numpy as jnp

from cartpoleplusplus_tpu.agents import common
from cartpoleplusplus_tpu.env import CartpoleConfig
from cartpoleplusplus_tpu.utils import event_log as el
from cartpoleplusplus_tpu.utils import fidelity


def _drive(tmp_path, config, act_fn, params, tol=0.0):
    path = str(tmp_path / "eval.events")
    lengths = common.record_eval_episodes(
        config, act_fn, params, path, num_episodes=2, seed=3,
        raster=config.use_raw_pixels,
    )
    assert len(lengths) == 2 and all(1 <= n <= config.max_episode_len
                                     for n in lengths)
    episodes = list(el.read_event_log(path))
    assert [len(ep.event) for ep in episodes] == lengths
    # The recorded (pose + velocity) stream must re-simulate within tol:
    # bit-exact when the resim compiles the SAME program (lowdim); the pixel
    # recording fuses the render epilogue into the step, which lets XLA
    # reassociate shared pose math by ~1 ULP vs the obs-free resim program.
    for ep in episodes:
        recorded, resim = fidelity.resim_episode(ep, config)
        report = fidelity.divergence_report(recorded, resim)
        assert report["max_pos_err"] <= tol
    return episodes


def test_record_lowdim_resimulates(tmp_path):
    config = CartpoleConfig(discrete_actions=True, max_episode_len=20)
    # "Trained params" stand-in: a bias the greedy policy reads, so the test
    # also covers the params-as-jit-argument calling convention.
    params = {"bias": jnp.zeros((5,))}
    act_fn = lambda p, obs: jnp.argmax(
        p["bias"][None] + jnp.zeros((obs.shape[0], 5)), axis=-1
    )
    _drive(tmp_path, config, act_fn, params)


def test_record_pixels_raster(tmp_path):
    config = CartpoleConfig(
        discrete_actions=False, use_raw_pixels=True, max_episode_len=8,
        render_width=20, render_height=20,
    )
    params = {"w": jnp.zeros((2,))}
    act_fn = lambda p, obs: jnp.broadcast_to(
        jnp.tanh(p["w"]), (obs.shape[0], 2)
    )
    episodes = _drive(tmp_path, config, act_fn, params, tol=1e-6)
    assert len(episodes[0].event) >= 1
