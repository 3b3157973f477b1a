"""Microbenchmark one render frame on the real chip.

The full-loop ladder (BASELINE.md) shows the 50x50 raycast render dominates
the pixel path (~2 ms/frame at 4096 envs of the ~8.7 ms fused step), so this
script times JUST the batched render, with each frame state-dependent on the
previous one (no DCE/hoisting — see the microbench traps note in
BASELINE.md), synchronizing by fetching a scalar (axon tunnel: block_until_
ready returns at enqueue).

Usage:
  python scripts/bench_render_micro.py [--num-envs 4096] [--dtype bf16|f32]
      [--cams 1] [--iters 20] [--reps 3]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, default=4096)
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    p.add_argument("--cams", type=int, default=1)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--reps", type=int, default=3)
    opts = p.parse_args()

    from cartpoleplusplus_tpu.env import cartpole as cm
    from cartpoleplusplus_tpu.env.config import CartpoleConfig
    from cartpoleplusplus_tpu.render import make_observe_pixels

    cfg = CartpoleConfig(use_raw_pixels=True, num_cameras=opts.cams)
    scene = cm.scene_for(cfg)
    dtype = jnp.bfloat16 if opts.dtype == "bf16" else jnp.float32
    observe = make_observe_pixels(cfg, dtype=dtype)

    states, _ = cm.reset_batched(
        cfg, scene, jax.random.PRNGKey(0), opts.num_envs, observe
    )
    rigid = states.rigid

    @jax.jit
    def many(rigid):
        def body(carry, _):
            rigid, acc = carry
            frame = jax.vmap(lambda r: observe(scene, r))(rigid)
            # Feed a scalar of the frame back into the pose: every frame
            # depends on the previous one, so nothing hoists or DCEs.
            acc = jnp.sum(frame[:, :8].astype(jnp.float32)) * 1e-12
            rigid = rigid.replace(pos=rigid.pos + acc)
            return (rigid, acc), None

        (rigid, acc), _ = jax.lax.scan(body, (rigid, 0.0), None, length=opts.iters)
        return acc

    # Warm up / compile.
    float(many(rigid))
    best = float("inf")
    for _ in range(opts.reps):
        t0 = time.perf_counter()
        float(many(rigid))
        best = min(best, time.perf_counter() - t0)

    frames = opts.iters
    ms = best / frames * 1e3
    rays = opts.num_envs * opts.cams * cfg.render_width * cfg.render_height
    print(
        f"render {opts.num_envs} envs x {opts.cams} cam(s) {opts.dtype}: "
        f"{ms:.3f} ms/frame  ({rays / (ms * 1e-3) / 1e9:.2f} Grays/s, "
        f"backend={jax.default_backend()})"
    )


if __name__ == "__main__":
    main()
