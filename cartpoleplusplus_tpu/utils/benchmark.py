"""Benchmark + profiling harness: the framework's perf CLI.

The reference has no benchmarks at all (SURVEY.md §6); its only timing signal
is per-episode wall-clock lines on stderr.  The rebuild makes throughput a
first-class CLI: measure the fused sim+render+act+learn loop in env
steps/sec/chip, optionally capture a ``jax.profiler`` trace, and emit a
single machine-readable JSON line (the repo-root ``bench.py`` wraps this).

Usage:
  python -m cartpoleplusplus_tpu.utils.benchmark [--num-envs 4096] [...]
  cartpole-bench --trace-dir /tmp/trace   # + tensorboard-compatible trace
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import optax

BASELINE_TARGET = 1e7  # env steps/sec/chip, BASELINE.json north star


def add_bench_opts(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--num-envs", type=int, default=4096)
    parser.add_argument("--num-cameras", type=int, default=1)
    parser.add_argument("--action-repeats", type=int, default=3)
    parser.add_argument("--steps-per-repeat", type=int, default=5)
    parser.add_argument("--steps-per-segment", type=int, default=20)
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--replay-capacity", type=int, default=8192,
                        help="must exceed --num-envs for the s2-free replay "
                             "fast path (replay/buffer.py) to engage")
    parser.add_argument("--segments", type=int, default=5)
    parser.add_argument("--lowdim", action="store_true",
                        help="benchmark low-dim obs instead of pixels")
    parser.add_argument("--pallas-render", action="store_true", default=None,
                        help="use the Pallas camera kernel instead of the "
                             "XLA ray caster (default: on when num-envs is "
                             "a multiple of the kernel's 32-env tile — it "
                             "wins the race on the real chip: 1.04M vs "
                             "0.79M steps/s at 4096 envs)")
    parser.add_argument("--no-pallas-render", dest="pallas_render",
                        action="store_false")
    parser.add_argument("--pallas-physics", action="store_true", default=None,
                        help="use the Pallas fused physics kernel instead "
                             "of the XLA SoA path (default: on when "
                             "num-envs is a multiple of 1024)")
    parser.add_argument("--no-pallas-physics", dest="pallas_physics",
                        action="store_false")
    parser.add_argument("--sim-only", action="store_true",
                        help="benchmark sim+render only (no learner)")
    parser.add_argument("--no-fused-step", dest="fused_step",
                        action="store_false", default=True,
                        help="disable the one-launch fused physics+render "
                             "step path (engages when both Pallas kernels "
                             "are on); useful for racing it against the "
                             "per-repeat kernel composition")
    parser.add_argument("--obs-pool", type=int, default=2,
                        help="k×k average-pool in the render epilogue "
                             "(env/config.py obs_pool): the full 50×50 "
                             "render happens, but every downstream obs hop "
                             "(carry, replay, policy) moves k²× fewer bytes")
    parser.add_argument("--render-tile-e", type=int, default=32,
                        help="env-tile height of the Pallas render kernel "
                             "(VMEM permitting; for racing tile sizes)")
    parser.add_argument("--render-recip", action="store_true", default=True,
                        help="slab times via Mosaic's one-op approximate "
                             "reciprocal instead of the division-free ratio "
                             "cascade (162 vs 188 census ops/ray; won the "
                             "on-chip race by +13%% and is the default — "
                             "see BASELINE.md round-3 roofline)")
    parser.add_argument("--no-render-recip", dest="render_recip",
                        action="store_false")
    parser.add_argument("--render-raster", action="store_true", default=True,
                        help="cast via the projective inverse-depth "
                             "rasterizer (raycast._ray_obb_q) instead of a "
                             "slab cascade: every bound is affine in screen "
                             "coords, census 110 vs 162 ops/ray (round-3.5 "
                             "algorithm-class diet; overrides --render-recip)."
                             "  Default ON for the bench; run() falls back to "
                             "the slab kernel if the Mosaic backend rejects "
                             "it (AOT front-end lowering is CI-tested, the "
                             "LLO backend compile only happens on hardware)")
    parser.add_argument("--no-render-raster", dest="render_raster",
                        action="store_false")
    parser.add_argument("--render-mxu", action="store_true", default=False,
                        help="with the raster kernel, evaluate the six "
                             "affine w-planes as one f32 MXU matmul per "
                             "camera (24 of the 110 census VPU ops/ray move "
                             "to the otherwise-idle MXU).  Opt-in until the "
                             "on-chip race decides (scripts/chip_queue.sh); "
                             "w rounding differs by ~1 ULP from the VPU "
                             "evaluation, so output can differ on exact "
                             "silhouette ties")
    parser.add_argument("--obs-samples", type=int, default=0,
                        help="sub-pixel samples per pooled obs pixel "
                             "(0 = all obs-pool² = exact; 2/1 trade obs "
                             "antialiasing for proportionally fewer rays)")
    parser.add_argument("--pixel-pool", type=int, default=1,
                        help="encoder-side pool (agents' --pixel-pool); "
                             "superseded by --obs-pool for the bench path")
    parser.add_argument("--trace-dir", type=str, default=None,
                        help="capture a jax.profiler trace to this dir")


def build(opts):
    """(state, segment_fn) for the configured fused loop."""
    from cartpoleplusplus_tpu.agents import common, ddpg as ddpg_mod
    from cartpoleplusplus_tpu.env.config import CartpoleConfig

    config = CartpoleConfig(
        discrete_actions=False,
        use_raw_pixels=not opts.lowdim,
        num_cameras=opts.num_cameras,
        render_width=50,
        render_height=50,
        action_repeats=opts.action_repeats,
        steps_per_repeat=opts.steps_per_repeat,
        obs_pool=getattr(opts, "obs_pool", 1) if not opts.lowdim else 1,
        obs_samples=getattr(opts, "obs_samples", 0) if not opts.lowdim else 0,
    )
    pallas_physics = getattr(opts, "pallas_physics", None)
    if pallas_physics is None:  # auto: kernel needs 1024-env tiles
        pallas_physics = opts.num_envs % 1024 == 0
    pallas_render = getattr(opts, "pallas_render", None)
    if pallas_render is None:  # auto: kernel needs 32-env tiles
        pallas_render = opts.num_envs % 32 == 0
    venv = common.make_venv(
        config, opts.num_envs,
        pallas_render=pallas_render and not opts.lowdim,
        pallas_physics=pallas_physics,
        fused_step=getattr(opts, "fused_step", True),
        render_tile_e=getattr(opts, "render_tile_e", 32),
        # Fallback matches make_venv's production default (recip kernel won
        # the on-chip race) — opts shims without the attr get the fast path.
        render_recip=getattr(opts, "render_recip", True),
        render_raster=getattr(opts, "render_raster", False),
        render_mxu=getattr(opts, "render_mxu", False),
    )

    if opts.sim_only:
        from cartpoleplusplus_tpu.env.vector import resolve_obs

        def make_state():
            states, obs = venv.reset(jax.random.PRNGKey(0))
            return (states, obs, jnp.zeros((opts.num_envs,), bool))

        @jax.jit
        def segment(carry):
            def body(c, _):
                states, obs, prev_done = c
                # Lazy auto-reset (env/vector.py round 3): act on the
                # resolved obs; the select fuses into this read.
                obs_in = resolve_obs(prev_done, obs, obs)
                action = jnp.tanh(
                    obs_in.reshape(obs.shape[0], -1)[:, :2].astype(jnp.float32)
                )
                states, obs, r, d = venv.step_lazy(
                    states, action, reset_pool=(states, obs)
                )
                return (states, obs, d), r.mean()

            carry, rs = jax.lax.scan(body, carry, None, length=opts.steps_per_segment)
            return carry, {"reward": rs.mean()}

        return jax.jit(make_state)(), segment

    from cartpoleplusplus_tpu.models import Actor, Critic

    pool = getattr(opts, "pixel_pool", 1)
    actor = Actor(action_dim=2, use_raw_pixels=config.use_raw_pixels,
                  pixel_pool=pool,
                  height=config.obs_height, width=config.obs_width)
    critic = Critic(use_raw_pixels=config.use_raw_pixels, pixel_pool=pool,
                    height=config.obs_height, width=config.obs_width)
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


_RASTER_REJECTED = False  # sticky: one backend rejection skips later retries


def run(opts) -> dict:
    global _RASTER_REJECTED
    import copy

    if _RASTER_REJECTED and getattr(opts, "render_raster", False):
        opts = copy.copy(opts)
        opts.render_raster = False

    def build_and_warm(o):
        # Build + warm one segment; synchronize by FETCHING a scalar —
        # under remote-execution runtimes block_until_ready returns at
        # enqueue.  The raster kernel's Mosaic BACKEND compile can fire
        # during build() too (init_state's eager reset renders), so both
        # stages live inside the fallback scope.
        st, segment = build(o)
        st, m = segment(st)
        float(m["reward"])
        return st, segment

    # The raster kernel's backend compile only happens on real hardware
    # (its front-end lowering is pinned in CI); if the chip rejects it,
    # fall back to the validated slab kernel rather than brick the bench.
    # One raster RE-try first, so a transient tunnel hiccup doesn't get
    # misattributed and sticky-downgrade every later row to slab.
    try:
        st, segment = build_and_warm(opts)
    except Exception as e:
        if not (getattr(opts, "render_raster", False) and not opts.lowdim):
            raise
        print(f"# warmup failed with the raster kernel enabled "
              f"({type(e).__name__}: {e}); retrying raster once",
              file=sys.stderr)
        try:
            st, segment = build_and_warm(opts)
        except Exception as e2:
            print(f"# raster retry failed too ({type(e2).__name__}); "
                  "falling back to the slab kernel", file=sys.stderr)
            opts = copy.copy(opts)
            opts.render_raster = False
            st, segment = build_and_warm(opts)
            # An unrelated failure re-raises from the line above with its
            # real traceback and no sticky flag; two consecutive raster
            # failures + a slab success is treated as a real rejection —
            # skip the failed compile on later rows this process.
            _RASTER_REJECTED = True

    if opts.trace_dir:
        jax.profiler.start_trace(opts.trace_dir)
    try:
        t0 = time.perf_counter()
        for _ in range(opts.segments):
            st, m = segment(st)
        float(m["reward"])
        dt = time.perf_counter() - t0
    finally:
        # Always close the trace: a mid-row failure that leaks an active
        # profiler would make every retry/later row die at start_trace.
        if opts.trace_dir:
            jax.profiler.stop_trace()

    env_steps = opts.segments * opts.steps_per_segment * opts.num_envs
    sps = env_steps / dt
    name = "batched_env_steps_per_sec_per_chip"
    if not opts.lowdim:
        name += "_pixel_render"
    if opts.sim_only:
        name += "_sim_only"
    return {
        "metric": name,
        "value": round(sps, 1),
        "unit": "env_steps/sec/chip",
        "vs_baseline": round(sps / BASELINE_TARGET, 4),
        "_wall_s": round(dt, 3),
        "_env_steps": env_steps,
        "_backend": jax.default_backend(),
        "_render_raster": bool(getattr(opts, "render_raster", False))
        and not opts.lowdim,
    }


def main(argv=None):
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    parser = argparse.ArgumentParser(description="cartpole++ TPU benchmark")
    add_bench_opts(parser)
    parser.add_argument(
        "--single", action="store_true",
        help="benchmark exactly the flags given (one row).  Default: the "
             "headline PAIR — the production config-5 shape (2 cameras, "
             "obs-samples 2: what BASELINE.json and the pixel-DDPG runs "
             "recommend) as the reported metric, plus the 1-camera exact-"
             "render row for round-over-round comparability (VERDICT r2 "
             "item 2: bench the shape the project actually recommends)")
    opts = parser.parse_args(argv)

    if opts.single or opts.lowdim:
        result = run(opts)
        meta = {k: v for k, v in result.items() if k.startswith("_")}
        print(json.dumps({k: v for k, v in result.items() if not k.startswith("_")}))
        print(f"# {meta}", file=sys.stderr)
        return

    import copy

    def run_retry(o, attempts=3, wait=60):
        """One bench row, retried on transient failures.

        The driver's round-end BENCH run is one-shot over the remote
        tunnel; a single enqueue hiccup must cost a retry, not the whole
        headline JSON.  A row that still fails after ``attempts`` is
        dropped (reported on stderr) and the remaining rows are emitted.
        """
        for i in range(attempts):
            try:
                return run(copy.copy(o))
            except Exception as e:  # tunnel flake, transient OOM, …
                print(f"# bench row failed (attempt {i + 1}/{attempts}): "
                      f"{type(e).__name__}: {e}", file=sys.stderr)
                if i + 1 < attempts:
                    time.sleep(wait)
        return None

    # Headline: BASELINE.json config 5 — dual camera, samples=2 antialiased
    # pooled obs (learning-equivalence evidence in BASELINE.md round 2).
    o5 = copy.copy(opts)
    o5.num_cameras, o5.obs_samples = 2, 2
    r5 = run_retry(o5)
    # Secondary: the single-camera exact-average render (rounds 1-2 headline).
    o1 = copy.copy(opts)
    o1.num_cameras, o1.obs_samples = 1, 0
    r1 = run_retry(o1)
    # Speed row: point-sampled pooled obs — the sanctioned ray-count lever
    # (BASELINE.md round-3 roofline: throughput is VPU-bound and linear in
    # shaded rays; 10M at exact 50×50 is infeasible in this algorithm class).
    os1 = copy.copy(opts)
    os1.num_cameras, os1.obs_samples = 1, 1
    rs1 = run_retry(os1)
    # Low-dim row: the sim+learn loop with no renderer — the other half of
    # the north star ("batched env steps/sec"), where the round-3 physics
    # op diet moved the ceiling (BASELINE.md physics-census section).
    old = copy.copy(opts)
    old.lowdim = True
    rld = run_retry(old)

    labeled = [
        (r5, "2cam_samples2 (BASELINE config 5, production)", "_2cam_s2"),
        (r1, "1cam_exact (r1/r2 headline)", "_1cam_exact"),
        (rs1, "1cam_samples1 (ray-count speed config)", "_1cam_s1"),
        (rld, "lowdim (sim+learn, no renderer)", "_lowdim"),
    ]
    done = [(r, label, tag) for r, label, tag in labeled if r is not None]
    if not done:
        raise SystemExit("all bench rows failed")
    head, _, head_tag = done[0]  # config-5 headline; best surviving row else
    out = {
        "metric": head["metric"] + head_tag,
        "value": head["value"],
        "unit": head["unit"],
        "vs_baseline": head["vs_baseline"],
        "rows": [
            {"config": label, "value": r["value"],
             "vs_baseline": r["vs_baseline"]}
            for r, label, _ in done
        ],
    }
    print(json.dumps(out))
    meta = {
        k: v for d, _, _ in done for k, v in d.items() if k.startswith("_")
    }
    print(f"# {meta}", file=sys.stderr)


if __name__ == "__main__":
    main()
