#!/usr/bin/env bash
# Round-3 chip-time measurement queue — everything that was blocked on the
# 2026-08-17 TPU-tunnel outage, in judge-priority order, self-driving (the
# tunnel watcher can launch this unattended; each step is best-effort and the
# queue re-probes the tunnel between steps so a second outage pauses rather
# than burns the queue).  Logs: /tmp/chipq/<step>.log + /tmp/chipq/queue.log.
#
#   1. low-dim remeasure after the physics op diet (BASELINE.md "Round 3:
#      physics op diet" promises measured numbers; projection ~13.4M), plus
#      the 8192/16384 scaling race.
#   2. the two unmeasured render-roofline cells (1cam samples=2, 2cam exact).
#   3. the headline bench triple (also warms the driver's BENCH_r03 compile
#      cache — remote compiles take minutes, /tmp/jax_cache persists).
#   4. TD3 pixel sweep seeds 2+3 (s2 was cut by the outage at segment 13000).
#   5. artifact run (checkpoints + eval events + GIF) seeded from the best
#      completed TD3 final.
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

step() {
  local name=$1 t=${T:-1800}
  shift
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
# Round-4 solver-iteration race: 3 Jacobi iterations pass every fidelity
# arbiter (tests/test_solver_iters.py) at 4932 vs 6780 census ops/substep —
# ceiling 21.5M vs 15.6M.  Default flips only on a measured win here PLUS
# the learning validation below (the validated DDPG recipe at iters=3 must
# still solve; sweep.sh COMMON shape, ~3 min chip time).
step lowdim_4096_it3 python bench.py --lowdim --num-envs 4096 --replay-capacity 8192 --solver-iters 3
T=2700 step ddpg_it3_learn python -m cartpoleplusplus_tpu.agents.ddpg \
  --solver-iters 3 \
  --num-envs 128 --num-eval 64 --eval-freq 100 \
  --steps-per-segment 25 --batch-size 256 --replay-capacity 131072 \
  --warmup-steps 40 --num-train-batches 1500 \
  --reward-scale 0.1 --grad-clip 10 \
  --seed 0 --metrics-jsonl runs/ddpg_it3_s0.jsonl

# --- 1.5 raster-vs-slab render kernel race (round-3.5 op diet) --------------
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
# Stage attribution for the raster kernel (updates the BASELINE stage table:
# with render 1.47x cheaper, bookkeeping/learner may re-emerge as next cost).
T=2700 step stages_raster python scripts/bench_stages.py --num-envs 4096

# --- 1.75 pixel 16384-env HBM-cliff attribution (VERDICT r3 item 7) ---------
# Round 3 measured 16384 pixel envs ~20% below 4096/8192 and attributed it
# to HBM pressure without a profile.  Re-race at the raster op diet (smaller
# render ops stress memory relatively more), then attribute: per-stage
# timings and a profiler trace for the slow cell.
step pix_8192 python bench.py --single --num-envs 8192 --replay-capacity 16384 --num-cameras 1 --obs-samples 0
step pix_16384 python bench.py --single --num-envs 16384 --replay-capacity 32768 --num-cameras 1 --obs-samples 0
T=2700 step stages_16384 python scripts/bench_stages.py --num-envs 16384
step trace_16384 python bench.py --single --num-envs 16384 --replay-capacity 32768 --num-cameras 1 --obs-samples 0 --trace-dir /tmp/trace16k

# --- 2. unmeasured roofline cells (now measure the raster default) ----------
step cell_1cam_s2 python bench.py --single --num-cameras 1 --obs-samples 2
step cell_2cam_exact python bench.py --single --num-cameras 2 --obs-samples 0

# --- 3. headline triple (BENCH_r03 shape; warms the compile cache) ---------
T=5400 step bench_triple python bench.py

# --- 4. TD3 sweep, missing seeds -------------------------------------------
rm -f runs/ddpg_pixels_td3_s2.jsonl  # outage-truncated partial (in git)
T=3700 step td3_s2 env SEEDS=2 bash scripts/pixel_td3_sweep.sh
T=3700 step td3_s3 env SEEDS=3 bash scripts/pixel_td3_sweep.sh

# --- 5. artifact run from the best completed seed ---------------------------
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

# --- 6. ray-count-scaled learning validation --------------------------------
# The roofline's honest north-star formulation is ray-count-scaled
# (BASELINE.md): 2-cam samples=1 halves config-5's shaded rays (ceiling
# 2.61M).  Validate the TD3 recipe still learns there, so the faster config
# ships with evidence rather than as an untested knob.
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

# bench row for the same config (fused loop, no learner variation needed:
# the default bench measures the DDPG loop; this is the 2cam samples=1 cell)
step cell_2cam_s1 python bench.py --single --num-cameras 2 --obs-samples 1

# --- 7. "best >= 150" push (VERDICT r2 item 4's full bar) --------------------
# Same compiled shapes as the sweep (warm cache), longer horizon: the cosine
# lr + OU anneal stretch with --num-train-batches, and the 15000-segment runs
# were still climbing at cutoff (finals 127/110, peaks 133).  Seeded from the
# best completed final — same selection as step 5 (no sweep files are
# written between them), so reuse $BEST rather than duplicating the logic.
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
