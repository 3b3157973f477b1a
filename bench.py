#!/usr/bin/env python
"""Headline benchmark: batched env steps/sec/chip with pixel render.

Measures the flagship fused loop — vectorized sim + per-repeat pixel render +
actor forward + replay write + DDPG train step, all one jitted program — on
the default backend (the real TPU chip under the driver), and prints ONE JSON
line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numbers (BASELINE.md); the binding
target is BASELINE.json's north star of 10,000,000 batched env steps/sec/chip
with pixel rendering, so vs_baseline = value / 1e7.

Flags let the driver/judge vary the config; defaults follow BASELINE.json
config 5 (4096 envs, pixel obs, fused learner) with 1 camera.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax

# Persistent compile cache: bench re-runs shouldn't pay the multi-minute
# remote-compile round trip every time.
_CACHE = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
import jax.numpy as jnp
import optax

from cartpoleplusplus_tpu.agents import common, ddpg as ddpg_mod
from cartpoleplusplus_tpu.env.config import CartpoleConfig
from cartpoleplusplus_tpu.models import Actor, Critic

BASELINE_TARGET = 1e7  # env steps/sec/chip, BASELINE.json north star


def build(opts):
    config = CartpoleConfig(
        discrete_actions=False,
        use_raw_pixels=not opts.lowdim,
        num_cameras=opts.num_cameras,
        render_width=50,
        render_height=50,
        action_repeats=opts.action_repeats,
        steps_per_repeat=opts.steps_per_repeat,
    )
    venv = common.make_venv(config, opts.num_envs)
    actor = Actor(action_dim=2, use_raw_pixels=config.use_raw_pixels)
    critic = Critic(use_raw_pixels=config.use_raw_pixels)
    atx, ctx = optax.adam(1e-4), optax.adam(1e-3)

    o = type("O", (), {"seed": 0, "replay_capacity": opts.replay_capacity})()
    st = ddpg_mod.init_state(o, config, venv, actor, critic, atx, ctx)
    segment = jax.jit(
        ddpg_mod.make_segment(
            venv, actor, critic, atx, ctx,
            gamma=0.99, tau=0.005, batch_size=opts.batch_size,
            warmup_steps=0, steps_per_segment=opts.steps_per_segment,
            ou_theta=0.15, ou_sigma=0.2,
        ),
        donate_argnums=0,
    )
    return st, segment


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-envs", type=int, default=4096)
    parser.add_argument("--num-cameras", type=int, default=1)
    parser.add_argument("--action-repeats", type=int, default=3)
    parser.add_argument("--steps-per-repeat", type=int, default=5)
    parser.add_argument("--steps-per-segment", type=int, default=20)
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--replay-capacity", type=int, default=4096)
    parser.add_argument("--segments", type=int, default=5)
    parser.add_argument("--lowdim", action="store_true",
                        help="benchmark low-dim obs instead of pixels")
    opts = parser.parse_args()

    st, segment = build(opts)

    # Warm up: compile + one real segment.  NOTE: synchronize by *fetching*
    # a scalar, not block_until_ready — under the axon remote-execution
    # tunnel block_until_ready returns at enqueue, not completion.
    st, m = segment(st)
    float(m["reward"])

    t0 = time.perf_counter()
    for _ in range(opts.segments):
        st, m = segment(st)
    float(m["reward"])
    dt = time.perf_counter() - t0

    env_steps = opts.segments * opts.steps_per_segment * opts.num_envs
    sps = env_steps / dt
    print(
        json.dumps(
            {
                "metric": "batched_env_steps_per_sec_per_chip"
                + ("" if opts.lowdim else "_pixel_render"),
                "value": round(sps, 1),
                "unit": "env_steps/sec/chip",
                "vs_baseline": round(sps / BASELINE_TARGET, 4),
            }
        )
    )
    print(
        f"# backend={jax.default_backend()} envs={opts.num_envs} "
        f"cams={opts.num_cameras} repeats={opts.action_repeats} "
        f"substeps={opts.steps_per_repeat} wall={dt:.3f}s "
        f"env_steps={env_steps}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
