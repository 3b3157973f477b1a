"""Event log + fidelity harness tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from cartpoleplusplus_tpu.env import CartpoleConfig
from cartpoleplusplus_tpu.env import cartpole as cartpole_mod
from cartpoleplusplus_tpu.utils import event_log as el
from cartpoleplusplus_tpu.utils import fidelity


def _record_episode(tmp_path, cfg, scene, n_steps=6, seed=0):
    state, _ = cartpole_mod.reset(cfg, scene, jax.random.PRNGKey(seed))
    events = []
    rng = np.random.RandomState(seed)
    for _ in range(n_steps):
        action = int(rng.randint(5))
        # Record the POST-step state with the action that produced it (the
        # random_agent convention fidelity.resim_episode expects).
        state, _, reward, done = cartpole_mod.step(cfg, scene, state, jnp.int32(action))
        pose = np.concatenate(
            [np.asarray(state.rigid.pos), np.asarray(state.rigid.quat)], axis=-1
        )
        vels = np.concatenate(
            [np.asarray(state.rigid.vel), np.asarray(state.rigid.ang)], axis=-1
        )
        events.append(
            el.make_event(pose[0], pose[1], action, float(reward), bool(done),
                          velocities=vels)
        )
    path = os.path.join(str(tmp_path), "ep.log")
    log = el.EventLog(path)
    log.add_episode(events)
    log.close()
    return path


def test_event_log_roundtrip(tmp_path):
    cfg = CartpoleConfig(action_repeats=2, steps_per_repeat=2, initial_force_steps=4)
    scene = cartpole_mod.scene_for(cfg)
    path = _record_episode(tmp_path, cfg, scene)
    episodes = list(el.read_event_log(path))
    assert len(episodes) == 1
    ep = episodes[0]
    assert len(ep.event) == 6
    poses = el.episode_poses(ep)
    assert poses.shape == (6, 2, 7)
    assert len(ep.event[0].cart.linear_velocity) == 3


def test_gif_out_from_pose_only_log(tmp_path):
    """--gif-out re-renders pose-only episodes into an animated GIF."""
    cfg = CartpoleConfig(action_repeats=2, steps_per_repeat=2, initial_force_steps=4)
    scene = cartpole_mod.scene_for(cfg)
    path = _record_episode(tmp_path, cfg, scene)
    gif_dir = os.path.join(str(tmp_path), "gifs")
    el.main([
        "--log-file", path, "--gif-out", gif_dir,
        "--gif-size", "24", "--gif-scale", "2",
    ])
    gif = os.path.join(gif_dir, "ep00000.gif")
    assert os.path.exists(gif)
    from PIL import Image

    with Image.open(gif) as im:
        assert im.size == (48, 48)
        # PIL merges identical consecutive frames; the cart moves under the
        # reset push so at least some of the 6 events must survive.
        assert im.n_frames >= 2


def test_fidelity_resim_is_exact(tmp_path):
    cfg = CartpoleConfig(action_repeats=2, steps_per_repeat=2, initial_force_steps=4)
    scene = cartpole_mod.scene_for(cfg)
    path = _record_episode(tmp_path, cfg, scene)
    ep = next(iter(el.read_event_log(path)))
    recorded, resim = fidelity.resim_episode(ep, cfg)
    report = fidelity.divergence_report(recorded, resim)
    assert report["max_pos_err"] < 1e-6


def test_metrics_tensorboard_sink(tmp_path):
    """--tb-dir (SURVEY §5 'optional TensorBoard'): numeric fields become
    scalars in a real events file; JSONL/stderr behavior is unchanged."""
    from cartpoleplusplus_tpu.utils.metrics import MetricsLogger

    log = MetricsLogger(str(tmp_path / "m.jsonl"), quiet=True,
                        tb_dir=str(tmp_path / "tb"))
    log.log("train", segment=1, loss=0.5, note="text-ignored")
    log.log("train", segment=2, loss=0.25)
    log.close()

    events = list((tmp_path / "tb").glob("events.out.tfevents.*"))
    assert events and events[0].stat().st_size > 0
    jsonl = (tmp_path / "m.jsonl").read_text().strip().splitlines()
    assert len(jsonl) == 2 and '"loss": 0.25' in jsonl[1]
