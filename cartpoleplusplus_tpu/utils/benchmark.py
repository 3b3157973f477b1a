"""Benchmark + profiling harness: the framework's perf CLI.

The reference has no benchmarks at all (SURVEY.md §6); its only timing signal
is per-episode wall-clock lines on stderr.  The rebuild makes throughput a
first-class CLI: measure the fused sim+render+act+learn loop in env
steps/sec/chip, optionally capture a ``jax.profiler`` trace, and emit
machine-readable JSON lines (the repo-root ``bench.py`` wraps this).

Outage-proof by design (the round-3 BENCH artifact died to a hung remote
backend): the suite probes backend liveness in a killable subprocess before
paying any compile, runs each row under a per-attempt subprocess watchdog,
streams every row's JSON line the moment it lands (a timeout kill of the
suite loses at most the in-flight row), and emits a structured
``{"error": ...}`` line instead of silence on total failure.

Usage:
  python -m cartpoleplusplus_tpu.utils.benchmark [--num-envs 4096] [...]
  cartpole-bench --trace-dir /tmp/trace   # + tensorboard-compatible trace
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import optax

BASELINE_TARGET = 1e7  # env steps/sec/chip, BASELINE.json north star

# Measured roofline constants (scripts/roofline.py; BASELINE.md round 3).
# The north star (1e7 at exact 1-cam 50×50) is infeasible in this algorithm
# class — it would need ≤21 VPU ops per shaded ray, less than one 3-slab OBB
# test — so every row also reports its MEASURED-CENSUS ceiling (element-op
# census × measured VPU mix rate) and vs_ceiling, the honest ray-count-scaled
# formulation (VERDICT r3 item 6).
VPU_MIX_TOPS = 1.59e12  # cascade-mix (mul/add/cmp/select) f32 element-ops/s
RENDER_OPS_PER_RAY = {  # traced-jaxpr census, element-weighted, per shaded ray
    "raster_mxu": 62.4,   # projective raster, bound planes offloaded to MXU
    "raster": 110.4,      # projective inverse-depth raster (_ray_obb_q)
    "slab_recip": 162.3,  # affine slab cascade + one-op approx reciprocal
    "slab_ratio": 188.3,  # division-free cross-multiplied ratio cascade
}
# Trip-weighted census of soa._substep (r3 diet): 2160 fixed (manifold,
# integration, corners) + 924 per Jacobi solver iteration → 6780 at the
# round-2/3 5-iteration setting, 4932 at the validated 3-iter default
# (scripts/roofline.py physics_census(iterations=…), pinned in
# tests/test_solver_iters.py).
PHYS_OPS_FIXED = 2160
PHYS_OPS_PER_ITER = 924


def census_ceiling(opts) -> float:
    """Throughput bound (env steps/s/chip) from measured censuses.

    ceiling = VPU mix rate / (render census × rays/step + physics census ×
    substeps/step).  Rays/step = cams × action_repeats × pooled-pixels ×
    samples-per-pooled-pixel (obs_samples=0 means all pool² sub-pixels).
    Counts only the sim+render censuses — actor/critic/replay ride the MXU
    and XLA fusion slack, which is why a well-fused loop can sit slightly
    above the render-only bound (BASELINE.md round-3 roofline).
    """
    repeats = getattr(opts, "action_repeats", 3)
    substeps = repeats * getattr(opts, "steps_per_repeat", 5)
    phys = PHYS_OPS_FIXED + getattr(opts, "solver_iters", 3) * PHYS_OPS_PER_ITER
    ops = phys * substeps
    if not getattr(opts, "lowdim", False):
        pool = max(1, getattr(opts, "obs_pool", 2))
        samples = getattr(opts, "obs_samples", 0) or pool * pool
        rays = (
            getattr(opts, "num_cameras", 1) * repeats
            * (50 // pool) * (50 // pool) * samples
        )
        if getattr(opts, "render_raster", False):
            kernel = ("raster_mxu" if getattr(opts, "render_mxu", False)
                      else "raster")
        else:
            kernel = ("slab_recip" if getattr(opts, "render_recip", True)
                      else "slab_ratio")
        ops += RENDER_OPS_PER_RAY[kernel] * rays
    return VPU_MIX_TOPS / ops


DEFAULT_NUM_ENVS = 4096


def add_bench_opts(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--num-envs", type=int, default=DEFAULT_NUM_ENVS)
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
    parser.add_argument("--render-raster", action="store_true", default=None,
                        help="cast via the projective inverse-depth "
                             "rasterizer (raycast._ray_obb_q) instead of a "
                             "slab cascade: every bound is affine in screen "
                             "coords, census 110 vs 162 ops/ray (round-3.5 "
                             "algorithm-class diet; overrides --render-recip)."
                             "  Default: auto per config from the round-4 "
                             "on-chip race (render.prefer_raster — raster "
                             "won 1-cam exact +9%%, slab won config-5 +7%%); "
                             "run() falls back to the slab kernel if the "
                             "Mosaic backend rejects it (AOT front-end "
                             "lowering is CI-tested, the LLO backend compile "
                             "only happens on hardware)")
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
    parser.add_argument("--solver-iters", type=int, default=3,
                        help="Jacobi contact-solver iterations per substep "
                             "(3 = validated default since round 4 — "
                             "fidelity arbiters + full-scale learning + "
                             "measured 18.4M low-dim steps/s; 5 = the "
                             "round-2/3 conservative setting)")
    parser.add_argument("--raster-hoist", dest="raster_hoist",
                        action="store_true", default=False,
                        help="hoist the raster's per-env setup to batched "
                             "XLA packed columns (_pack_setups).  Measured "
                             "23%% SLOWER on chip (round-4b race: VMEM "
                             "streaming beats lane-serial recompute only "
                             "on paper) — default OFF, kept as a race knob")
    parser.add_argument("--no-raster-hoist", dest="raster_hoist",
                        action="store_false",
                        help="explicit off (the default)")
    parser.add_argument("--trace-dir", type=str, default=None,
                        help="capture a jax.profiler trace to this dir")
    parser.add_argument("--min-wall-s", type=float, default=0.5,
                        help="auto-extend the timed window (same compiled "
                             "program, doubling) until it spans at least "
                             "this much wall time — short windows are "
                             "dominated by fixed remote-dispatch overhead "
                             "(~48 ms measured; a 72 ms low-dim row under- "
                             "reported 2.1x in round 4)")
    parser.add_argument("--bench-windows", type=int, default=3,
                        help="independent timed windows per row; the BEST "
                             "throughput is reported (all are recorded in "
                             "_windows).  A single window through the remote "
                             "tunnel can straddle a transient stall: round 5 "
                             "caught a 22x-degraded config-5 window (47.7k "
                             "vs 1.08M minutes earlier, same compiled "
                             "program) — best-of-N is the standard defense")


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
        solver_iterations=getattr(opts, "solver_iters", 3),
    )
    if getattr(opts, "render_raster", None) is None:
        # Tristate auto: resolve onto opts (not just locally) so run()'s
        # ceiling, fallback, and _render_raster provenance all see the
        # same concrete pick as the venv built here.
        from cartpoleplusplus_tpu.render import prefer_raster

        opts.render_raster = (not opts.lowdim) and prefer_raster(
            config.num_cameras, config.obs_pool, config.obs_samples)
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
        render_hoist=getattr(opts, "raster_hoist", False),
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

    # None (tristate auto) could resolve to raster in build(): pin it to
    # slab too once the backend has rejected the raster kernel.
    if _RASTER_REJECTED and getattr(opts, "render_raster", False) is not False:
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

    min_wall = getattr(opts, "min_wall_s", 0.5)
    if opts.trace_dir:
        jax.profiler.start_trace(opts.trace_dir)
    try:
        def timed_window(first_batch: int):
            # Auto-extend short windows: fixed dispatch overhead through the
            # remote tunnel (~48 ms, measured round 4) dominated the default
            # 100-step low-dim row — it read 5.7M steps/s where a 500-step
            # window of the SAME compiled program reads 12.1M.  Doubling the
            # window costs no recompiles; cap at 64x the requested segments
            # so a stubbed/instant segment fn can't spin.  EVERY window
            # extends (round-5 review): a stall during window 1's doubling
            # loop converges it small, and a fixed-size re-run of that small
            # window against a healthy tunnel lands back in the dispatch-
            # dominated regime the extension exists to escape.
            nonlocal st
            segs, batch = 0, first_batch
            t0 = time.perf_counter()
            while True:
                for _ in range(batch):
                    st, m = segment(st)
                float(m["reward"])  # sync: fetch a scalar through the tunnel
                dt = time.perf_counter() - t0
                segs += batch
                if dt >= min_wall or segs >= opts.segments * 64:
                    return segs, dt
                batch = segs  # double the window each pass

        # Best-of-N windows (round 5): one window through the remote tunnel
        # can straddle a transient stall — bench_suite_final measured the
        # SAME compiled config-5 program at 47.7k steps/s where a window
        # ten minutes earlier read 1.08M (and the very next rows were
        # healthy).  Re-run N-1 more windows (each seeded at the previous
        # converged size, each free to extend) and report the best; every
        # window is recorded for honesty.
        windows = [timed_window(opts.segments)]
        for _ in range(max(1, getattr(opts, "bench_windows", 3)) - 1):
            windows.append(timed_window(windows[-1][0]))
    finally:
        # Always close the trace: a mid-row failure that leaks an active
        # profiler would make every retry/later row die at start_trace.
        if opts.trace_dir:
            jax.profiler.stop_trace()

    per_step = opts.steps_per_segment * opts.num_envs
    window_sps = [round(s * per_step / t, 1) for s, t in windows]
    segs_run, dt = max(windows, key=lambda w: w[0] / w[1])
    env_steps = segs_run * opts.steps_per_segment * opts.num_envs
    sps = env_steps / dt
    name = "batched_env_steps_per_sec_per_chip"
    if not opts.lowdim:
        name += "_pixel_render"
    if opts.sim_only:
        name += "_sim_only"
    # Ceiling from the FINAL opts — after any raster→slab fallback, so the
    # bound matches the kernel that actually ran.
    ceiling = census_ceiling(opts)
    return {
        "metric": name,
        "value": round(sps, 1),
        "unit": "env_steps/sec/chip",
        "vs_baseline": round(sps / BASELINE_TARGET, 4),
        "ceiling": round(ceiling, 1),
        "vs_ceiling": round(sps / ceiling, 4),
        "_wall_s": round(dt, 3),
        "_windows": window_sps,
        "_env_steps": env_steps,
        "_num_envs": opts.num_envs,
        "_num_cameras": (None if opts.lowdim
                         else getattr(opts, "num_cameras", None)),
        "_obs_samples": (None if opts.lowdim
                         else getattr(opts, "obs_samples", None)),
        "_backend": jax.default_backend(),
        "_render_raster": bool(getattr(opts, "render_raster", False))
        and not opts.lowdim,
    }


_PROBE_CODE = (
    "import jax, jax.numpy as jnp; "
    "assert float(jnp.sum(jnp.ones((8, 8)))) == 64.0"
)


def probe_backend(timeout_s: float = 150, attempts: int = 2) -> bool:
    """Fail-fast backend liveness probe, in a KILLABLE subprocess.

    A dead remote backend doesn't error — it hangs in compile/enqueue for
    tens of minutes (BENCH_r03 burned its whole timeout on one warmup), and
    an in-process hang can't be interrupted.  One tiny matmul in a child
    answers 'is the chip there' in seconds or gets killed at ``timeout_s``.

    Retries with a FRESH child (``attempts``, round-5): a cold/contended
    tunnel was measured taking 126 s for this same op while the backend was
    perfectly healthy — one 90 s shot misreads that as an outage (the
    BENCH_r04 0.0).  Killing a hung child and reconnecting gets a fresh
    connection, and the server-side warmup from attempt 1 usually makes
    attempt 2 fast.  A truly dead backend costs attempts × timeout_s, still
    minutes not tens of minutes.
    """
    for _ in range(max(1, attempts)):
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_CODE],
                timeout=timeout_s, capture_output=True,
            )
            if r.returncode == 0:
                return True
        except (subprocess.TimeoutExpired, OSError):
            pass
    return False


# The default multi-row suite: config-5 production headline first (BASELINE
# config 5; learning-equivalence evidence in BASELINE.md round 2), then the
# r1/r2-comparable exact row, the sanctioned ray-count speed row, and the
# low-dim half of the north star (round-3 physics op diet).
ROW_SPECS = [
    ("2cam_samples2 (BASELINE config 5, production)", "_2cam_s2",
     {"num_cameras": 2, "obs_samples": 2}),
    ("1cam_exact (r1/r2 headline)", "_1cam_exact",
     {"num_cameras": 1, "obs_samples": 0}),
    ("1cam_samples1 (ray-count speed config)", "_1cam_s1",
     {"num_cameras": 1, "obs_samples": 1}),
    # 8192 envs: physics is dependency-depth-bound, so VPU lanes are only
    # 1/4 full at 4096 — per-chip low-dim throughput peaks at 8192 (18.4M
    # vs 16.1M, BASELINE r4 "north star crossed" + r5 re-measure).  An
    # explicit --num-envs from the user still wins (see the suite loop).
    ("lowdim (sim+learn, no renderer, 8192 envs)", "_lowdim",
     {"lowdim": True, "num_envs": 8192}),
]

# The honest north-star statement, machine-readable in every BENCH artifact
# (VERDICT r3 items 5/6): vs_baseline keeps the raw 1e7 ratio for
# round-over-round comparability; vs_ceiling is the per-config bound.
NORTH_STAR_NOTE = (
    "vs_baseline = value/1e7 (BASELINE.json north star); the roofline "
    "(BASELINE.md r3) proves 1e7 is infeasible at exact 1-cam 50x50 "
    "rendering (needs <=21 VPU ops/shaded ray), so the target is "
    "ray-count-scaled: vs_ceiling = value / (measured VPU mix rate / "
    "config's census ops per env step)"
)


def _child_argv(opts, overrides: dict) -> list:
    """argv for a ``--single`` child row: base opts + per-row overrides."""
    merged = dict(
        num_envs=opts.num_envs, num_cameras=opts.num_cameras,
        action_repeats=opts.action_repeats,
        steps_per_repeat=opts.steps_per_repeat,
        steps_per_segment=opts.steps_per_segment, batch_size=opts.batch_size,
        replay_capacity=opts.replay_capacity, segments=opts.segments,
        obs_pool=opts.obs_pool, obs_samples=opts.obs_samples,
        render_tile_e=opts.render_tile_e, pixel_pool=opts.pixel_pool,
        solver_iters=opts.solver_iters, min_wall_s=opts.min_wall_s,
        bench_windows=getattr(opts, "bench_windows", 3),
    )
    flags = dict(
        lowdim=opts.lowdim, sim_only=opts.sim_only,
        pallas_render=opts.pallas_render, pallas_physics=opts.pallas_physics,
        fused_step=opts.fused_step, render_recip=opts.render_recip,
        render_raster=opts.render_raster, render_mxu=opts.render_mxu,
        raster_hoist=getattr(opts, "raster_hoist", False),
    )
    for k, v in overrides.items():
        (flags if isinstance(v, bool) else merged)[k] = v
    # --probe-timeout 0: the parent already probes and the row watchdog
    # bounds a child that hits a mid-row outage; a per-child probe would
    # just add latency.
    argv = [sys.executable, "-m", "cartpoleplusplus_tpu.utils.benchmark",
            "--single", "--probe-timeout", "0"]
    for k, v in merged.items():
        argv += [f"--{k.replace('_', '-')}", str(v)]
    for k, v in flags.items():
        name = k.replace("_", "-")
        if v is True and k != "fused_step":  # --fused-step has no
            argv.append(f"--{name}")          # positive flag (the default)
        elif v is False and k in ("fused_step", "render_recip",
                                  "render_raster", "pallas_render",
                                  "pallas_physics"):
            argv.append(f"--no-{name}")
        # None (tristate auto) / False store_true flags: omit.
    if opts.trace_dir:
        argv += ["--trace-dir", opts.trace_dir]
    return argv


def _parse_last_json(text):
    for line in reversed((text or "").splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                pass
    return None


def _child_env():
    """Child env with the package's parent dir on PYTHONPATH.

    The parent may be running as ``python /path/to/bench.py`` from any cwd
    (script-dir sys.path entry, no installed package); the ``-m`` child has
    no such entry, and every row dying with ModuleNotFoundError against a
    healthy backend would be a new artifact-loss mode.
    """
    import cartpoleplusplus_tpu

    pkg_parent = os.path.dirname(
        os.path.dirname(os.path.abspath(cartpoleplusplus_tpu.__file__))
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [pkg_parent] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    )
    return env


def _run_row_subprocess(argv, timeout_s):
    """One row attempt in a watchdogged child → parsed JSON dict or None.

    The child is the ``--single`` CLI: it prints one JSON line (meta keys
    included) on success.  A hung remote compile costs ONE attempt's
    timeout, not the whole bench (VERDICT r3 weak #1); the persistent
    compile cache (/tmp/jax_cache) makes retries cheap once a compile DID
    land.  Child stderr is forwarded for the queue logs.
    """
    try:
        proc = subprocess.run(
            argv, timeout=timeout_s, capture_output=True, text=True,
            env=_child_env(),
        )
    except subprocess.TimeoutExpired as e:
        # The child may have PRINTED its finished result and then hung in
        # teardown (trace flush / D2H over a flaky tunnel).  Salvage the
        # completed measurement rather than re-paying the whole row.
        out = e.stdout.decode() if isinstance(e.stdout, bytes) else e.stdout
        salvaged = _parse_last_json(out)
        if salvaged is not None and "value" in salvaged:
            print(f"# row child hung after printing its result "
                  f"(killed at {timeout_s:.0f}s); salvaged", file=sys.stderr)
            return salvaged
        print(f"# row attempt timed out after {timeout_s:.0f}s (killed)",
              file=sys.stderr)
        return None
    if proc.stderr:
        sys.stderr.write(proc.stderr)
    if proc.returncode != 0:
        print(f"# row attempt failed rc={proc.returncode}", file=sys.stderr)
        return None
    result = _parse_last_json(proc.stdout)
    if result is None:
        print("# row attempt printed no JSON line", file=sys.stderr)
    return result


def _emit(obj) -> None:
    """One JSON line, flushed IMMEDIATELY — a timeout kill of this process
    must not lose rows that already completed (the driver tails stdout)."""
    print(json.dumps(obj), flush=True)


# ----------------------------------------------------------------------
# Measurement provenance (VERDICT r4 item 2): a probe failure must degrade
# to stale-but-real numbers, not zero the evidence chain.  Every successful
# measurement persists its rows here; the backend-down / all-rows-failed
# error JSON carries the latest persisted block as ``last_measured``.

_LAST_MEASURED = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "runs",
    "bench_last_measured.json")


def _iso_now() -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())


def record_last_measured(summary: dict) -> None:
    """Persist a successful measurement (suite summary or single row).

    Best-effort: an unwritable tree (installed package, read-only checkout)
    must never fail a measurement that already succeeded.
    """
    if not summary.get("value"):
        return
    # Never record CPU rows (e.g. the backend-down CPU smoke child): the
    # provenance block exists to preserve REAL chip measurements across
    # outages, and a 5k-steps/s CPU row would overwrite a 1.5M TPU one.
    backends = {summary.get("_backend")} | {
        (r.get("meta") or {}).get("_backend")
        for r in summary.get("rows") or []
    }
    backends.discard(None)
    if "cpu" in backends or not backends:
        return
    entry = {
        "recorded_by": "builder",
        "timestamp_iso": _iso_now(),
        "metric": summary.get("metric"),
        "value": summary.get("value"),
        "unit": summary.get("unit"),
        "vs_baseline": summary.get("vs_baseline"),
        "config": {k: summary.get(k) for k in
                   ("_num_envs", "_num_cameras", "_obs_samples")
                   if summary.get(k) is not None},
        "rows": summary.get("rows"),
    }
    try:
        path = os.path.normpath(_LAST_MEASURED)
        prior = {}
        if os.path.exists(path):
            with open(path) as f:
                prior = json.load(f)
        if summary.get("rows"):
            key = "suite"
        else:
            # Per-config keys: a cfg-5 single row must never overwrite the
            # 1-cam headline's evidence (they share a metric name).
            key = str(summary.get("metric")) + "".join(
                f"|{k[1:]}={summary[k]}" for k in
                ("_num_cameras", "_obs_samples", "_num_envs")
                if summary.get(k) is not None)
        # Preserve the best-ever value alongside the latest: a tunnel-
        # degraded window (round 5: 47.7k where the same program measured
        # 1.08M) must not erase the real evidence.  ``value`` stays the
        # LATEST measurement (honest last-seen semantics); ``best`` carries
        # the maximum with its own timestamp, and a >2x drop vs best is
        # flagged so readers see the row is suspect, not a regression.
        old = prior.get(key) or {}
        best = old.get("best") or ({"value": old["value"],
                                    "timestamp_iso": old.get("timestamp_iso")}
                                   if old.get("value") else None)
        if not best or entry["value"] >= best["value"]:
            best = {"value": entry["value"],
                    "timestamp_iso": entry["timestamp_iso"]}
        entry["best"] = best
        if entry["value"] < 0.5 * best["value"]:
            entry["degraded_vs_best"] = round(entry["value"] / best["value"],
                                              4)
        prior[key] = entry
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(prior, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
    except Exception as e:  # pragma: no cover - depends on fs state
        print(f"# last_measured not persisted: {e}", file=sys.stderr)


def load_last_measured():
    """The provenance block for failure JSON, or None if never measured."""
    try:
        with open(os.path.normpath(_LAST_MEASURED)) as f:
            return json.load(f)
    except Exception:
        return None


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
        help="benchmark exactly the flags given (one row, in-process).  "
             "Default: the headline suite — config-5 production shape "
             "(2 cameras, obs-samples 2) as the reported metric plus the "
             "1-camera exact, ray-count speed, and low-dim rows — each row "
             "in a watchdogged subprocess, streamed as it lands")
    parser.add_argument(
        "--probe-timeout", type=float, default=150,
        help="fail-fast backend liveness probe budget (seconds, PER "
             "attempt); a dead remote backend hangs rather than errors, so "
             "the suite probes in a killable child before paying any "
             "compile")
    parser.add_argument(
        "--probe-attempts", type=int, default=2,
        help="liveness probe attempts (fresh child each): a cold tunnel "
             "was measured at 126s for the probe op while healthy — one "
             "short shot misreads that as an outage")
    parser.add_argument(
        "--row-timeout", type=float, default=1500,
        help="per-attempt watchdog for one suite row (seconds)")
    parser.add_argument(
        "--row-attempts", type=int, default=2,
        help="attempts per suite row before dropping it")
    opts = parser.parse_args(argv)

    def emit_backend_down():
        # Distinguish "the chip is gone" from "the harness is broken": one
        # tiny low-dim row on the CPU backend (fresh child, forced platform,
        # like __graft_entry__'s re-exec) proves the measurement code runs.
        smoke = None
        try:
            env = _child_env()
            env["JAX_PLATFORMS"] = "cpu"
            env.pop("JAX_COMPILATION_CACHE_DIR", None)
            env["PYTHONPATH"] = env["PYTHONPATH"].split(os.pathsep)[0]
            proc = subprocess.run(
                [sys.executable, "-m", "cartpoleplusplus_tpu.utils.benchmark",
                 "--single", "--probe-timeout", "0", "--lowdim",
                 "--num-envs", "32", "--segments", "1",
                 "--steps-per-segment", "2", "--batch-size", "8",
                 "--replay-capacity", "64"],
                timeout=300, capture_output=True, text=True, env=env,
            )
            parsed = _parse_last_json(proc.stdout)
            if proc.returncode == 0 and parsed and "value" in parsed:
                smoke = {"ok": True, "backend": parsed.get("_backend")}
            else:
                smoke = {"ok": False, "rc": proc.returncode}
        except Exception as e:
            smoke = {"ok": False, "rc": f"{type(e).__name__}"}
        _emit({
            "metric": "batched_env_steps_per_sec_per_chip_pixel_render",
            "value": 0.0, "unit": "env_steps/sec/chip", "vs_baseline": 0.0,
            "error": f"backend unavailable: {opts.probe_attempts}x"
                     f"{opts.probe_timeout:g}s liveness probe failed "
                     "before any compile",
            "cpu_smoke": smoke,
            # The evidence chain survives the outage: most recent REAL
            # measurements (builder-recorded, ISO-stamped) — an outage
            # round degrades to stale-but-real, never to 0.0-with-no-past.
            "last_measured": load_last_measured(),
            "north_star": NORTH_STAR_NOTE,
        })

    if opts.single or opts.lowdim:
        # Same fail-fast contract as the suite: a dead backend costs the
        # probe timeout, not a hang until the caller's external timeout
        # (every chip-queue cell is a --single/--lowdim invocation).
        # --probe-timeout 0 skips the probe.
        if opts.probe_timeout > 0 and not probe_backend(
                opts.probe_timeout, opts.probe_attempts):
            emit_backend_down()
            return
        result = run(opts)
        # Meta keys stay inline so the suite parent (and the chip-queue
        # logs) see per-row provenance — e.g. _render_raster after a
        # fallback (ADVICE r3: last-row-wins meta merge misrepresented
        # earlier rows).
        _emit(result)
        record_last_measured(result)
        return

    if opts.probe_timeout > 0 and not probe_backend(
            opts.probe_timeout, opts.probe_attempts):
        emit_backend_down()
        return

    raster_rejected = False
    done = []  # (result, label, tag)
    aborted = None
    for label, tag, overrides in ROW_SPECS:
        row_raster = opts.render_raster
        if row_raster is None:  # auto: per-row pick, same rule as the child
            from cartpoleplusplus_tpu.render import prefer_raster

            row_raster = prefer_raster(
                overrides.get("num_cameras", opts.num_cameras),
                opts.obs_pool,
                overrides.get("obs_samples", opts.obs_samples))
        want_raster = (row_raster and not raster_rejected
                       and not overrides.get("lowdim", False))
        row_over = dict(overrides)
        # A row's num_envs override is a per-row BEST-shape default (the
        # lowdim lane-fill peak); an explicit user --num-envs still wins.
        if "num_envs" in row_over and opts.num_envs != DEFAULT_NUM_ENVS:
            row_over["num_envs"] = opts.num_envs
        if raster_rejected:
            row_over["render_raster"] = False
        result = None
        for attempt in range(opts.row_attempts):
            result = _run_row_subprocess(
                _child_argv(opts, row_over), opts.row_timeout)
            if result is not None:
                break
            if opts.probe_timeout > 0 and not probe_backend(
                    opts.probe_timeout, opts.probe_attempts):
                aborted = "backend died mid-suite"
                break
        if result is None and aborted is None and want_raster:
            # Both raster attempts burned their watchdog with a live
            # backend — treat like the in-process fallback does two raster
            # exceptions: one slab try, sticky on success.
            row_over["render_raster"] = False
            result = _run_row_subprocess(
                _child_argv(opts, row_over), opts.row_timeout)
            if result is not None:
                raster_rejected = True
                print("# raster rows hung twice, slab succeeded: "
                      "sticky slab for remaining rows", file=sys.stderr)
        if result is not None:
            if want_raster and result.get("_render_raster") is False:
                raster_rejected = True  # child's in-process fallback fired
            _emit({"config": label, **result})
            done.append((result, label, tag))
        else:
            print(f"# row dropped: {label}", file=sys.stderr)
        if aborted:
            break

    if not done:
        _emit({
            "metric": "batched_env_steps_per_sec_per_chip_pixel_render",
            "value": 0.0, "unit": "env_steps/sec/chip", "vs_baseline": 0.0,
            "error": aborted or "all bench rows failed "
                     "(probe alive; see stderr)",
            "last_measured": load_last_measured(),
            "north_star": NORTH_STAR_NOTE,
        })
        raise SystemExit(1)
    head, _, head_tag = done[0]  # config-5 headline; best surviving row else
    out = {
        "metric": head["metric"] + head_tag,
        "value": head["value"],
        "unit": head["unit"],
        "vs_baseline": head["vs_baseline"],
        "vs_ceiling": head.get("vs_ceiling"),
        "north_star": NORTH_STAR_NOTE,
        "rows": [
            {"config": label, "value": r["value"],
             "vs_baseline": r["vs_baseline"],
             "ceiling": r.get("ceiling"), "vs_ceiling": r.get("vs_ceiling"),
             "meta": {k: v for k, v in r.items() if k.startswith("_")}}
            for r, label, _ in done
        ],
    }
    if aborted:
        out["error"] = f"suite truncated: {aborted}"
    _emit(out)
    record_last_measured(out)


if __name__ == "__main__":
    main()
