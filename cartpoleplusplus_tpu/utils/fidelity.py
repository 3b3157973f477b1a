"""Fidelity harness: replay a recorded trajectory through the sim and diff.

SURVEY.md §3.5 identifies the event log as the reference's only trajectory
replay/inspection mechanism and "the natural hook for the rebuild's fidelity
harness".  This CLI closes that loop: given an event log (from this
framework, or converted from pybullet traces if ever available), it restores
the recorded dynamic state at step 0, re-applies the recorded action
sequence through the TPU physics, and reports per-step pose divergence.

Usage:
  python -m cartpoleplusplus_tpu.utils.fidelity --log-file traj.log \
      [--action-repeats 3 --steps-per-repeat 5] [--episode 0] [--json]

Exit code 1 if max divergence exceeds --tolerance (for CI use).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def restore_state(ev):
    """Event → RigidState (requires velocity fields in the log)."""
    import jax.numpy as jnp

    from cartpoleplusplus_tpu.physics.bodies import RigidState

    if not ev.cart.linear_velocity:
        raise ValueError(
            "event log lacks velocity fields; re-record with this framework "
            "(make_event velocities=...) to enable re-simulation"
        )
    pos = jnp.asarray([list(ev.cart.position), list(ev.pole.position)], jnp.float32)
    quat = jnp.asarray(
        [list(ev.cart.orientation), list(ev.pole.orientation)], jnp.float32
    )
    vel = jnp.asarray(
        [list(ev.cart.linear_velocity), list(ev.pole.linear_velocity)], jnp.float32
    )
    ang = jnp.asarray(
        [list(ev.cart.angular_velocity), list(ev.pole.angular_velocity)], jnp.float32
    )
    return RigidState(pos=pos, quat=quat, vel=vel, ang=ang)


def resim_episode(episode, config):
    """Re-simulate from step 0's state; → (recorded, resimmed) (T,2,7)."""
    import jax
    import jax.numpy as jnp

    from cartpoleplusplus_tpu.env import cartpole as cartpole_mod
    from cartpoleplusplus_tpu.env.cartpole import EnvState
    from cartpoleplusplus_tpu.utils.event_log import episode_poses

    scene = cartpole_mod.scene_for(config)
    recorded = episode_poses(episode)
    state = EnvState(
        rigid=restore_state(episode.event[0]),
        steps=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), jnp.bool_),
    )
    step = jax.jit(lambda s, a: cartpole_mod.step(config, scene, s, a))

    out = [recorded[0]]
    for ev in episode.event[1:]:
        action = np.asarray(list(ev.action), np.float32)
        if config.discrete_actions:
            action = jnp.int32(int(action[0]))
        state, _, _, _ = step(state, action)
        pose = np.concatenate(
            [np.asarray(state.rigid.pos), np.asarray(state.rigid.quat)], axis=-1
        )
        out.append(pose)
    return recorded, np.stack(out)


def divergence_report(recorded: np.ndarray, resim: np.ndarray) -> dict:
    pos_err = np.linalg.norm(recorded[:, :, :3] - resim[:, :, :3], axis=-1)
    quat_err = np.abs(recorded[:, :, 3:] - resim[:, :, 3:]).max(axis=-1)
    return {
        "steps": int(recorded.shape[0]),
        "max_pos_err": float(pos_err.max()),
        "mean_pos_err": float(pos_err.mean()),
        "max_quat_err": float(quat_err.max()),
        "final_pos_err": float(pos_err[-1].max()),
    }


def main(argv=None):
    from cartpoleplusplus_tpu.env.config import CartpoleConfig
    from cartpoleplusplus_tpu.utils.event_log import read_event_log

    parser = argparse.ArgumentParser(description="trajectory fidelity check")
    parser.add_argument("--log-file", required=True)
    parser.add_argument("--episode", type=int, default=None,
                        help="episode index (default: all)")
    parser.add_argument("--action-repeats", type=int, default=3)
    parser.add_argument("--steps-per-repeat", type=int, default=5)
    parser.add_argument("--action-force", type=float, default=50.0)
    parser.add_argument("--continuous", action="store_true")
    parser.add_argument("--tolerance", type=float, default=None,
                        help="fail (exit 1) if max_pos_err exceeds this")
    parser.add_argument("--json", action="store_true")
    opts = parser.parse_args(argv)

    config = CartpoleConfig(
        discrete_actions=not opts.continuous,
        action_repeats=opts.action_repeats,
        steps_per_repeat=opts.steps_per_repeat,
        action_force=opts.action_force,
        max_episode_len=10**9,  # never truncate a replay
    )

    if opts.episode is not None:
        # O(1) selection via the native header scan — a pixel log's earlier
        # episodes never get decoded.
        from cartpoleplusplus_tpu.utils.event_log import (
            index_event_log, read_episode_at,
        )

        offsets = index_event_log(opts.log_file)
        episodes = [
            (opts.episode, read_episode_at(opts.log_file, offsets[opts.episode]))
        ]
    else:
        episodes = enumerate(read_event_log(opts.log_file))

    worst = 0.0
    for i, ep in episodes:
        if len(ep.event) < 2:
            continue
        recorded, resim = resim_episode(ep, config)
        report = {"episode": i, **divergence_report(recorded, resim)}
        worst = max(worst, report["max_pos_err"])
        if opts.json:
            print(json.dumps(report))
        else:
            print(
                f"episode {i}: steps={report['steps']} "
                f"max_pos_err={report['max_pos_err']:.2e} "
                f"mean_pos_err={report['mean_pos_err']:.2e} "
                f"final_pos_err={report['final_pos_err']:.2e}"
            )
    if opts.tolerance is not None and worst > opts.tolerance:
        print(f"FAIL: max divergence {worst:.3e} > {opts.tolerance}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
