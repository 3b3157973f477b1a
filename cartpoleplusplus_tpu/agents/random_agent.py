"""Random-action agent: env smoke-runner + event-log generator.

Rebuild of the reference's ``random_action_agent.py`` (~60 LoC, SURVEY.md
§2.1/§3.5): roll uniformly random actions, print episode stats, optionally
record trajectories to an event log for render/physics inspection.

CLI: ``python -m cartpoleplusplus_tpu.agents.random_agent --num-episodes 10
--event-log-out /tmp/random.log``
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from cartpoleplusplus_tpu.env import cartpole as cartpole_mod
from cartpoleplusplus_tpu.env import config as env_config
from cartpoleplusplus_tpu.env.config import NUM_DISCRETE_ACTIONS, config_from_opts
from cartpoleplusplus_tpu.utils import event_log as event_log_mod
from cartpoleplusplus_tpu.utils.metrics import MetricsLogger


def run_episode(config, scene, step_fn, reset_fn, rng, collect=False,
                render_fn=None, policy=None):
    """Roll one episode on the host loop (random actions, or ``policy``).

    Host-driven (not fused) on purpose: this tool exists to inspect per-step
    data, matching the reference's usage.  ``render_fn`` (rigid → list of
    (H, W, 3) images) attaches per-camera PNG renders to each event — the
    reference's render-to-event-log path (random_action_agent.py +
    event_log.py --img-output-dir).  ``policy(obs) → action`` substitutes a
    trained greedy policy for the random draws; the event-assembly
    convention (post-step pose + (2, 6) velocity rows, done-flag alignment)
    that the fidelity resimulator depends on lives ONLY here —
    common.record_eval_episodes reuses this loop rather than copying it.
    """
    events = []
    rng, k = jax.random.split(rng)
    state, obs = reset_fn(k)
    total_reward, steps = 0.0, 0
    done = False
    while not done and steps < config.max_episode_len:
        if policy is not None:
            action = policy(obs)
        elif config.discrete_actions:
            rng, k = jax.random.split(rng)
            action = jax.random.randint(k, (), 0, NUM_DISCRETE_ACTIONS)
        else:
            rng, k = jax.random.split(rng)
            action = jax.random.uniform(k, (2,), minval=-1.0, maxval=1.0)
        state, obs, reward, done_arr = step_fn(state, action)
        done = bool(done_arr)
        total_reward += float(reward)
        steps += 1
        if collect:
            pose = np.asarray(
                jnp.concatenate([state.rigid.pos, state.rigid.quat], axis=-1)
            )
            vels = np.concatenate(
                [np.asarray(state.rigid.vel), np.asarray(state.rigid.ang)], axis=-1
            )
            renders = render_fn(state.rigid) if render_fn else None
            events.append(
                event_log_mod.make_event(
                    pose[0], pose[1], np.asarray(action), float(reward), done,
                    velocities=vels, renders=renders,
                )
            )
    return rng, steps, total_reward, events


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(
        description="random-action smoke agent (rebuild of random_action_agent.py)"
    )
    env_config.add_opts(parser)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--num-episodes", type=int, default=10)
    parser.add_argument("--continuous", action="store_true",
                        help="sample continuous 2D actions instead of discrete")
    parser.add_argument("--event-log-out", type=str, default=None)
    parser.add_argument("--record-renders", action="store_true",
                        help="attach per-camera PNG renders to logged events")
    parser.add_argument("--metrics-jsonl", type=str, default=None)
    opts = parser.parse_args(argv)
    print(f"OPTS {vars(opts)}", file=sys.stderr)

    config = config_from_opts(opts, discrete_actions=not opts.continuous)
    scene = cartpole_mod.scene_for(config)
    reset_fn = jax.jit(lambda k: cartpole_mod.reset(config, scene, k))
    step_fn = jax.jit(lambda s, a: cartpole_mod.step(config, scene, s, a))

    render_fn = None
    if opts.record_renders:
        from cartpoleplusplus_tpu.render import make_observe_pixels
        from cartpoleplusplus_tpu.render.raycast import frame_to_images

        observe = make_observe_pixels(config, dtype=jnp.float32)
        frame_jit = jax.jit(lambda r: observe(scene, r))

        def render_fn(rigid):
            return list(frame_to_images(config, np.asarray(frame_jit(rigid))))

    log = event_log_mod.EventLog(opts.event_log_out) if opts.event_log_out else None
    metrics = MetricsLogger(opts.metrics_jsonl, tb_dir=getattr(opts, "tb_dir", None))
    rng = jax.random.PRNGKey(opts.seed)
    lengths = []
    for ep in range(opts.num_episodes):
        rng, steps, total_reward, events = run_episode(
            config, scene, step_fn, reset_fn, rng, collect=log is not None,
            render_fn=render_fn,
        )
        lengths.append(steps)
        metrics.log("episode", idx=ep, steps=steps, total_reward=total_reward)
        if log:
            log.add_episode(events)
    metrics.log(
        "summary",
        episodes=opts.num_episodes,
        mean_len=float(np.mean(lengths)),
        max_len=int(np.max(lengths)),
    )
    if log:
        log.close()
    metrics.close()


if __name__ == "__main__":
    # Re-enter through the canonical module: under ``python -m`` this file
    # executes as __main__, and flax dataclasses defined here would register
    # as DIFFERENT pytree node types than the ones other modules import
    # (breaking e.g. the distributed path's tree_maps).
    from cartpoleplusplus_tpu.agents.random_agent import main as _main

    _main()
