"""Stage-by-stage perf attribution of the fused pixel loop on the real chip.

VERDICT round 1 asked for a measured breakdown of where the per-segment time
goes before optimizing.  This script times, at a given env count, each stage
of the fused DDPG pixel loop in isolation:

  physics   - action_repeats x steps_per_repeat Pallas (or SoA) substeps/step
  render    - action_repeats frames/step (the batched XLA ray caster)
  sim       - physics + render + env bookkeeping (benchmark --sim-only)
  full      - sim + replay + DDPG train step (the headline config)

Each timed program chains iterations state-dependently (no hoisting/DCE) and
synchronizes by fetching a scalar (axon tunnel: block_until_ready returns at
enqueue).  Prints a table plus per-stage ms/vectorized-step so the gap to the
north star decomposes additively.

Usage: python scripts/bench_stages.py [--num-envs 4096 8192 ...] [--cams 1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _time(fn, state, iters, reps=3):
    """Best-of-reps wall seconds for fn(state) (compiled, scalar-fetched)."""
    out = fn(state)
    float(out[1] if isinstance(out, tuple) else out)  # warm-up + sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(state)
        float(out[1] if isinstance(out, tuple) else out)
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, nargs="+", default=[4096])
    p.add_argument("--cams", type=int, default=1)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--no-pallas-physics", action="store_true")
    p.add_argument("--no-pallas-render", action="store_true")
    p.add_argument("--lowdim", action="store_true",
                   help="decompose the LOW-DIM loop instead: physics / sim "
                        "(no renderer) / full (round-3 op-diet attribution)")
    p.add_argument("--obs-pool", type=int, default=2,
                   help="render-epilogue pool for the sim/full stages "
                        "(matches bench.py's default)")
    p.add_argument("--render-raster", action="store_true", default=True,
                   help="projective inverse-depth raster kernel (the bench "
                        "default); --no-render-raster = slab cascade")
    p.add_argument("--no-render-raster", dest="render_raster",
                   action="store_false")
    opts = p.parse_args()

    from cartpoleplusplus_tpu.env import cartpole as cm
    from cartpoleplusplus_tpu.env.config import CartpoleConfig
    from cartpoleplusplus_tpu.physics import soa
    from cartpoleplusplus_tpu.render import make_observe_pixels
    from cartpoleplusplus_tpu.utils import benchmark as bench_mod

    cfg = CartpoleConfig(
        discrete_actions=False, use_raw_pixels=not opts.lowdim,
        num_cameras=opts.cams,
        render_width=50, render_height=50,
        obs_pool=opts.obs_pool if not opts.lowdim else 1,
    )
    scene = cm.scene_for(cfg)
    substeps_per_step = cfg.action_repeats * cfg.steps_per_repeat

    for num_envs in opts.num_envs:
        use_pallas = (not opts.no_pallas_physics) and num_envs % 1024 == 0
        if use_pallas:
            from cartpoleplusplus_tpu.physics.pallas_step import (
                step_substeps_pallas as physics,
            )
        else:
            physics = soa.step_substeps_batched
        use_pallas_render = ((not opts.no_pallas_render) and not opts.lowdim
                             and num_envs % 32 == 0)
        if opts.lowdim:
            observe_b = None
        elif use_pallas_render:
            from cartpoleplusplus_tpu.render.pallas_kernel import (
                make_render_batched,
            )

            observe_b = make_render_batched(cfg, raster=opts.render_raster)
        else:
            _obs = make_observe_pixels(
                cfg, dtype=jnp.uint8, raster=opts.render_raster
            )
            observe_b = lambda scene, r2: jax.vmap(
                lambda r: _obs(scene, r)
            )(r2)
        observe = None if opts.lowdim else make_observe_pixels(cfg, dtype=jnp.uint8)

        states, _ = cm.reset_batched(
            cfg, scene, jax.random.PRNGKey(0), num_envs, observe
        )
        rigid = states.rigid
        force = jnp.zeros((num_envs, 3), jnp.float32)

        # force is an ARGUMENT, not a closure constant: jits must not close
        # over device arrays (CLAUDE.md — the tunnel rejects the D2H copy
        # that embedding them as compile-time constants requires).
        @jax.jit
        def physics_only(rigid, force):
            def body(r, _):
                r = physics(scene, r, force, substeps_per_step)
                return r, None
            rigid, _ = jax.lax.scan(body, rigid, None, length=opts.iters)
            return rigid, jnp.sum(rigid.pos[:8])

        @jax.jit
        def render_only(rigid):
            def body(carry, _):
                rigid, acc = carry
                def rep(r2, _):
                    frame = observe_b(scene, r2)
                    s = jnp.sum(frame[:, :8].astype(jnp.float32))
                    # Feed the frame back into the pose so the 3-repeat
                    # scan body is NOT loop-invariant — otherwise XLA's
                    # while-loop LICM hoists the render and this row
                    # measures ~1 frame instead of action_repeats frames
                    # (same trap bench_render_micro.py documents).
                    r2 = r2.replace(pos=r2.pos + s * 1e-12)
                    return r2, s
                _, accs = jax.lax.scan(rep, rigid, None,
                                       length=cfg.action_repeats)
                acc = jnp.sum(accs) * 1e-12
                rigid = rigid.replace(pos=rigid.pos + acc)
                return (rigid, acc), None
            (rigid, acc), _ = jax.lax.scan(
                body, (rigid, 0.0), None, length=opts.iters)
            return rigid, acc

        class O:  # benchmark opts shim
            pass
        o = O()
        o.num_envs = num_envs
        o.num_cameras = opts.cams
        o.action_repeats = cfg.action_repeats
        o.steps_per_repeat = cfg.steps_per_repeat
        o.steps_per_segment = opts.iters
        o.batch_size = 128
        o.replay_capacity = max(8192, 2 * num_envs)
        o.segments = 1
        o.lowdim = opts.lowdim
        o.pallas_render = use_pallas_render
        o.pallas_physics = use_pallas
        o.obs_pool = opts.obs_pool
        o.pixel_pool = 1
        o.trace_dir = None
        o.render_raster = opts.render_raster

        o.sim_only = True
        st, seg = bench_mod.build(o)
        def sim_fn(st, seg=seg):
            st, m = seg(st)
            return st, m["reward"]
        t_sim = _time(lambda s: sim_fn(s), st, opts.iters)

        o.sim_only = False
        st_f, seg_f = bench_mod.build(o)
        last = [st_f]
        def full_fn(st, seg_f=seg_f):
            st, m = seg_f(last[0])
            last[0] = st
            return st, m["reward"]
        t_full = _time(full_fn, st_f, opts.iters)

        t_phys = _time(lambda r: physics_only(r, force), rigid, opts.iters)
        t_rend = 0.0 if opts.lowdim else _time(render_only, rigid, opts.iters)

        def row(name, t):
            print(f"  {name:<22} {t * 1e3:8.3f} ms/step   "
                  f"{num_envs / t / 1e6:8.3f} M env steps/s" if t > 0 else
                  f"  {name:<22}      —")
        print(f"num_envs={num_envs} lowdim={opts.lowdim} cams={opts.cams} "
              f"pallas_physics={use_pallas} "
              f"pallas_render={use_pallas_render} "
              f"backend={jax.default_backend()}")
        row(f"physics ({substeps_per_step} substeps)", t_phys)
        if not opts.lowdim:
            row(f"render ({cfg.action_repeats} frames)", t_rend)
        row("sim (phys[+render]+env)", t_sim)
        row("full (sim+replay+train)", t_full)
        row("  -> learner+replay", t_full - t_sim)
        row("  -> env bookkeeping", t_sim - t_phys - t_rend)


if __name__ == "__main__":
    main()
