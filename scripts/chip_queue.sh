#!/usr/bin/env bash
# Chip-time measurement queue — every cell blocked on the 2026-08-17 TPU
# tunnel outage plus the round-4 races, in judge-priority order,
# self-driving AND resumable: a step whose previous run completed cleanly
# (END … exit=0 in queue.log, no structured {"error"} row in its log) is
# skipped on relaunch, so the queue can be killed/restarted across sessions
# without burning chip time re-measuring.  The queue re-probes the tunnel
# between steps so an outage pauses rather than burns it.
# Logs: /tmp/chipq/<step>.log + /tmp/chipq/queue.log.
#
# Priority order (VERDICT r3 "Next round" items):
#   1. low-dim op-diet remeasure + scaling race + timing-amortization
#      diagnostics (item 3: the 10M crossing).
#   2. raster/slab/MXU render-kernel races (item 4).
#   3. pixel 8192/16384 scaling cells (item 7).
#   4. roofline cells + headline bench triple (item 1 — also warms the
#      driver's BENCH_r04 compile cache; remote compiles take minutes,
#      /tmp/jax_cache persists).
#   5. TD3 seeds 2+3, artifact run (checkpoint+events+GIF), 35k push
#      (item 5: 4/4 >=100, best >=150, the money shot).
#   6. stage attribution, it3 learning validation, 2cam-s1 validation,
#      SAC chip evidence (opportunistic).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chipq
mkdir -p "$LOG"
note() { echo "[$(date -u '+%H:%M:%S')] $*" | tee -a "$LOG/queue.log"; }

# The chip serves ONE process: the queue must be off it before the driver's
# round-end BENCH/entry checks run, or they'd contend with a half-finished
# TD3 cell.  DEADLINE_TS (epoch seconds; the watcher can pass the round-end
# estimate) defaults to queue start + 9 h; steps launched after it are
# skipped, already-running steps still bound their own `timeout`.
DEADLINE_TS=${DEADLINE_TS:-$(($(date +%s) + 32400))}

probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
assert float(jnp.sum(jnp.ones((8, 8)))) == 64.0
" >/dev/null 2>&1
}

ensure_up() {  # block until the tunnel answers (re-probe every 3 min, <=4 h)
  for _ in $(seq 1 80); do
    probe && return 0
    note "tunnel down; waiting"
    sleep 180
  done
  note "tunnel never returned; giving up"
  exit 1
}

already_done() {  # resumable: clean END + no structured error row in the log
  local name=$1
  grep -q "END $name exit=0" "$LOG/queue.log" 2>/dev/null || return 1
  [ -f "$LOG/$name.log" ] || return 1
  ! grep -q '"error"' "$LOG/$name.log"
}

step() {
  local name=$1 t=${T:-1800}
  shift
  if already_done "$name"; then
    note "SKIP $name (already completed on a previous queue run)"
    return 0
  fi
  if [ "$(date +%s)" -gt "$DEADLINE_TS" ]; then
    note "SKIP $name (past deadline; freeing the chip for the driver)"
    return 0
  fi
  ensure_up
  # Re-check AFTER ensure_up: its wait loop can block up to 4 h, and a
  # tunnel that returns past the deadline must not launch the cell anyway.
  if [ "$(date +%s)" -gt "$DEADLINE_TS" ]; then
    note "SKIP $name (deadline passed while waiting for the tunnel)"
    return 0
  fi
  note "START $name: $*"
  timeout "$t" "$@" >"$LOG/$name.log" 2>&1
  note "END $name exit=$?"
}

# --- 1. low-dim op-diet remeasure + env-scaling race -----------------------
# --replay-capacity scales with envs (2 blocks): the default 8192 would
# silently drop the 8192/16384-env rows off the s2-free aligned replay
# path (common.replay_block needs envs < capacity), confounding the
# scaling race with a replay-configuration change.
step lowdim_4096 python bench.py --lowdim --num-envs 4096 --replay-capacity 8192
step lowdim_8192 python bench.py --lowdim --num-envs 8192 --replay-capacity 16384
step lowdim_16384 python bench.py --lowdim --num-envs 16384 --replay-capacity 32768
# Timing-amortization diagnostics: the standard cells time only 100
# vectorized steps (~70 ms wall at 4096 low-dim) — short enough that
# per-dispatch tunnel latency can distort the number.  --segments changes
# only the Python-side loop count (same compiled program, warm cache), so
# these cells are ~free and bound the dispatch-latency share directly.
step lowdim_4096_seg25 python bench.py --lowdim --num-envs 4096 --replay-capacity 8192 --segments 25
step lowdim_8192_seg25 python bench.py --lowdim --num-envs 8192 --replay-capacity 16384 --segments 25
# Round-4 solver-iteration race: 3 Jacobi iterations pass every fidelity
# arbiter (tests/test_solver_iters.py) at 4932 vs 6780 census ops/substep —
# ceiling 21.5M vs 15.6M.  Default flips only on a measured win here PLUS
# the learning validation below (the validated DDPG recipe at iters=3 must
# still solve; sweep.sh COMMON shape, ~3 min chip time).
step lowdim_4096_it3 python bench.py --lowdim --num-envs 4096 --replay-capacity 8192 --solver-iters 3
step lowdim_8192_it3 python bench.py --lowdim --num-envs 8192 --replay-capacity 16384 --solver-iters 3 --segments 25

# --- 2. raster-vs-slab render kernel race (round-3.5 op diet) --------------
# The projective inverse-depth rasterizer (raycast._ray_obb_q) is the new
# bench default (census 110 vs 162 ops/ray, f32-bit-exact vs the slab caster,
# AOT-lowering-tested); these cells race it against the slab kernel on the
# same chip session for the BASELINE.md table.  The slab numbers reproduce
# the round-3 measurements (1cam exact 1.357M, config-5 1.057M).
step raster_1cam python bench.py --single --num-cameras 1 --obs-samples 0
step slab_1cam python bench.py --single --num-cameras 1 --obs-samples 0 --no-render-raster
step raster_cfg5 python bench.py --single --num-cameras 2 --obs-samples 2
step slab_cfg5 python bench.py --single --num-cameras 2 --obs-samples 2 --no-render-raster
# MXU w-plane offload race (opt-in --render-mxu): the six affine plane
# evaluations (24 of the raster's 110 census VPU ops/ray) as one f32 MXU
# matmul per camera.  Only the chip can decide whether Mosaic retires the
# tiny-K dot cheaply enough to win.
step mxu_1cam python bench.py --single --num-cameras 1 --obs-samples 0 --render-mxu
step mxu_cfg5 python bench.py --single --num-cameras 2 --obs-samples 2 --render-mxu

# --- 3. pixel 16384-env HBM-cliff attribution (VERDICT r3 item 7) ----------
# Round 3 measured 16384 pixel envs ~20% below 4096/8192 and attributed it
# to HBM pressure without a profile.  Re-race at the raster op diet (smaller
# render ops stress memory relatively more), then attribute below (stage
# timings + profiler trace, section 6).
step pix_8192 python bench.py --single --num-envs 8192 --replay-capacity 16384 --num-cameras 1 --obs-samples 0
step pix_16384 python bench.py --single --num-envs 16384 --replay-capacity 32768 --num-cameras 1 --obs-samples 0

# --- 4. unmeasured roofline cells + headline triple -------------------------
step cell_1cam_s2 python bench.py --single --num-cameras 1 --obs-samples 2
step cell_2cam_exact python bench.py --single --num-cameras 2 --obs-samples 0
step cell_2cam_s1 python bench.py --single --num-cameras 2 --obs-samples 1
# Headline suite (BENCH_r04 shape; warms the driver's compile cache).
T=5400 step bench_triple python bench.py

# --- 5. TD3 sweep, missing seeds + artifacts + push --------------------------
if ! already_done td3_s2; then
  rm -f runs/ddpg_pixels_td3_s2.jsonl  # outage-truncated partial (in git)
fi
T=3700 step td3_s2 env SEEDS=2 bash scripts/pixel_td3_sweep.sh
T=3700 step td3_s3 env SEEDS=3 bash scripts/pixel_td3_sweep.sh

BEST=$(python - <<'PY'
import glob, json
best, bseed = -1.0, 0
for f in glob.glob("runs/ddpg_pixels_td3_s[0-9].jsonl"):
    last = None
    for line in open(f):
        rec = json.loads(line)
        if rec.get("event") == "train":
            last = rec  # LAST record, not segment==15000: outage/timeout
                        # truncation is the expected failure mode here
    if last and last["eval_ep_rew"] > best:
        best, bseed = last["eval_ep_rew"], int(f[-7])
print(bseed)
PY
)
note "artifact seed: $BEST"
T=3700 step td3_artifacts env SEED="$BEST" bash scripts/pixel_td3_artifacts.sh

# "best >= 150" push (VERDICT r2 item 4's full bar): same compiled shapes as
# the sweep (warm cache), longer horizon — the 15000-segment runs were still
# climbing at cutoff (finals 127/110, peaks 133).  Same seed selection as
# the artifact step (no sweep files are written between them).
BEST2=$BEST
note "push seed: $BEST2"
T=5400 step td3_push timeout 5300 python -m cartpoleplusplus_tpu.agents.ddpg \
  --use-raw-pixels --num-cameras 2 --obs-pool 2 --pixel-encoder conv \
  --num-envs 512 --num-eval 64 --eval-freq 500 \
  --steps-per-segment 25 --batch-size 256 --replay-capacity 65536 \
  --warmup-steps 40 --num-train-batches 35000 \
  --actor-learning-rate 1e-4 --critic-learning-rate 3e-4 --lr-schedule cosine \
  --reward-scale 0.1 --grad-clip 10 --aug-shift 2 \
  --ou-sigma-min 0.05 --ou-decay-steps 250000 \
  --twin-critic --policy-delay 2 --target-noise 0.2 \
  --pallas-render \
  --seed "$BEST2" --metrics-jsonl runs/ddpg_pixels_td3_push.jsonl

# --- 6. stage attribution + traces ------------------------------------------
# Stage attribution for the raster kernel (updates the BASELINE stage table:
# with render 1.47x cheaper, bookkeeping/learner may re-emerge as next cost).
T=2700 step stages_raster python scripts/bench_stages.py --num-envs 4096
T=2700 step stages_16384 python scripts/bench_stages.py --num-envs 16384
step trace_16384 python bench.py --single --num-envs 16384 --replay-capacity 32768 --num-cameras 1 --obs-samples 0 --trace-dir /tmp/trace16k

# --- 7. learning validations (it3 default flip gate; ray-count-scaled cfg) --
T=2700 step ddpg_it3_learn python -m cartpoleplusplus_tpu.agents.ddpg \
  --solver-iters 3 \
  --num-envs 128 --num-eval 64 --eval-freq 100 \
  --steps-per-segment 25 --batch-size 256 --replay-capacity 131072 \
  --warmup-steps 40 --num-train-batches 1500 \
  --reward-scale 0.1 --grad-clip 10 \
  --seed 0 --metrics-jsonl runs/ddpg_it3_s0.jsonl
# Ray-count-scaled learning validation: 2-cam samples=1 halves config-5's
# shaded rays (ceiling 2.61M).  Validate the TD3 recipe still learns there,
# so the faster config ships with evidence rather than as an untested knob.
T=3700 step td3_2cam_s1 timeout 3600 python -m cartpoleplusplus_tpu.agents.ddpg \
  --use-raw-pixels --num-cameras 2 --obs-pool 2 --obs-samples 1 \
  --pixel-encoder conv \
  --num-envs 512 --num-eval 64 --eval-freq 500 \
  --steps-per-segment 25 --batch-size 256 --replay-capacity 65536 \
  --warmup-steps 40 --num-train-batches 15000 \
  --actor-learning-rate 1e-4 --critic-learning-rate 3e-4 --lr-schedule cosine \
  --reward-scale 0.1 --grad-clip 10 --aug-shift 2 \
  --ou-sigma-min 0.05 --ou-decay-steps 250000 \
  --twin-critic --policy-delay 2 --target-noise 0.2 \
  --pallas-render \
  --seed 0 --metrics-jsonl runs/ddpg_pixels_td3_2cam_s1.jsonl

# --- 8. (opportunistic) SAC solve evidence ----------------------------------
# Beyond-parity agent landed round 4 (agents/sac.py, CPU gate green); a
# chip run with the NAF-shaped recipe gives it the same time-to-solve
# evidence the other agents carry.  Lowest priority: runs only if the
# deadline hasn't hit.
T=2700 step sac_lowdim python -m cartpoleplusplus_tpu.agents.sac \
  --num-envs 128 --num-eval 64 --eval-freq 100 \
  --steps-per-segment 25 --batch-size 256 --replay-capacity 131072 \
  --warmup-steps 40 --num-train-batches 5000 \
  --reward-scale 0.1 --grad-clip 10 --lr-schedule cosine \
  --seed 0 --metrics-jsonl runs/sac_lowdim_s0.jsonl
# Pixel SAC with the TD3-pixel-recipe shape (conv encoder, pooled obs, DrQ
# aug): does max-entropy exploration beat the OU-annealed TD3 curve?
T=3700 step sac_pixels python -m cartpoleplusplus_tpu.agents.sac \
  --use-raw-pixels --num-cameras 2 --obs-pool 2 --pixel-encoder conv \
  --num-envs 512 --num-eval 64 --eval-freq 500 \
  --steps-per-segment 25 --batch-size 256 --replay-capacity 65536 \
  --warmup-steps 40 --num-train-batches 15000 \
  --actor-learning-rate 1e-4 --critic-learning-rate 3e-4 --lr-schedule cosine \
  --reward-scale 0.1 --grad-clip 10 --aug-shift 2 \
  --pallas-render \
  --seed 0 --metrics-jsonl runs/sac_pixels_s0.jsonl

note "QUEUE DONE"
