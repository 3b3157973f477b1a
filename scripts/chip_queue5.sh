#!/usr/bin/env bash
# Round-4b queue, reordered (replaces a killed-while-waiting chip_queue4):
# the first hoisted-raster cells this session measured 22-27% BELOW the
# morning pre-hoist numbers, minutes before a tunnel outage — so the top
# priority when the tunnel returns is a clean back-to-back hoist race
# (same chip session, --no-raster-hoist knob just landed), THEN the
# BENCH_r04 cache warm at the freshly-flipped 3-iteration solver default,
# then the prefer_raster corners and the big learning cells.
# Same /tmp/chipq logs + resumability contract as chip_queue.sh.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chipq
mkdir -p "$LOG"
note() { echo "[$(date -u '+%H:%M:%S')] $*" | tee -a "$LOG/queue.log"; }

DEADLINE_TS=${DEADLINE_TS:-$(($(date +%s) + 7200))}

PROBE_T=600  # cold-cache first probe; 90 s once warm
probe() {
  timeout "$PROBE_T" python -c "
import jax, jax.numpy as jnp
assert float(jnp.sum(jnp.ones((8, 8)))) == 64.0
" >/dev/null 2>&1 && { PROBE_T=90; return 0; }
  return 1
}

ensure_up() {
  for _ in $(seq 1 60); do
    probe && return 0
    if [ "$(date +%s)" -gt "$DEADLINE_TS" ]; then
      note "deadline passed while tunnel down; giving up"
      exit 0
    fi
    note "tunnel down; waiting"
    sleep 180
  done
  note "tunnel never returned; giving up"
  exit 1
}

already_done() {
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
  if [ "$(date +%s)" -gt "$DEADLINE_TS" ]; then
    note "SKIP $name (deadline passed while waiting for the tunnel)"
    return 0
  fi
  note "START $name: $*"
  timeout "$t" "$@" >"$LOG/$name.log" 2>&1
  note "END $name exit=$?"
}

# --- 1. hoist race, back-to-back in one session ------------------------------
step race_1cam_hoist   python bench.py --single --num-cameras 1 --obs-samples 0 --render-raster
step race_1cam_nohoist python bench.py --single --num-cameras 1 --obs-samples 0 --render-raster --no-raster-hoist
step race_cfg5_hoist   python bench.py --single --num-cameras 2 --obs-samples 2 --render-raster
step race_cfg5_nohoist python bench.py --single --num-cameras 2 --obs-samples 2 --render-raster --no-raster-hoist
# Slab control in the same session (pins tunnel health against the morning
# slab numbers: 1.379M 1cam / 1.047M cfg5).
step race_1cam_slab    python bench.py --single --num-cameras 1 --obs-samples 0 --no-render-raster
step race_cfg5_slab    python bench.py --single --num-cameras 2 --obs-samples 2 --no-render-raster

# --- 2. BENCH_r04 cache warm at shipping defaults (3-iter solver) ------------
T=5400 step bench_triple_it3 python bench.py

# --- 3. low-dim remeasures at the new default --------------------------------
step lowdim_8192_def3 python bench.py --lowdim --num-envs 8192 --replay-capacity 16384 --segments 25
step lowdim_16384_def3 python bench.py --lowdim --num-envs 16384 --replay-capacity 32768 --segments 25

# --- 4. prefer_raster corners (hoist-winner raster vs slab) -------------------
step corner_2cam_exact_r python bench.py --single --num-cameras 2 --obs-samples 0 --render-raster
step corner_2cam_exact_s python bench.py --single --num-cameras 2 --obs-samples 0 --no-render-raster
step corner_1cam_s1_r python bench.py --single --num-cameras 1 --obs-samples 1 --render-raster
step corner_1cam_s1_s python bench.py --single --num-cameras 1 --obs-samples 1 --no-render-raster
step corner_1cam_s2_r python bench.py --single --num-cameras 1 --obs-samples 2 --render-raster
step corner_1cam_s2_s python bench.py --single --num-cameras 1 --obs-samples 2 --no-render-raster
step corner_2cam_s1_r python bench.py --single --num-cameras 2 --obs-samples 1 --render-raster
step corner_2cam_s1_s python bench.py --single --num-cameras 2 --obs-samples 1 --no-render-raster

# --- 5. big learning cells (opportunistic) -----------------------------------
# Round-4c priority order: the full-Rainbow evidence cell FIRST (BASELINE
# round-4b promises runs/dqn_rainbow_s0.jsonl), then the cheap SAC chip
# cells, then the opportunistic pixel corners.
T=2700 step dqn_rainbow python -m cartpoleplusplus_tpu.agents.dqn \
  --num-envs 128 --num-eval 64 --eval-freq 500 \
  --steps-per-segment 25 --batch-size 256 --replay-capacity 131072 \
  --warmup-steps 40 --num-train-batches 50000 \
  --lr-schedule cosine --reward-scale 0.1 --grad-clip 10 \
  --per --n-step 3 --dueling --c51 51 --c51-vmax 10 --noisy \
  --ckpt-dir runs/ckpt_dqn_rainbow --ckpt-freq 5000 --ckpt-skip-replay \
  --seed 0 --metrics-jsonl runs/dqn_rainbow_s0.jsonl
T=2700 step sac_lowdim python -m cartpoleplusplus_tpu.agents.sac \
  --num-envs 128 --num-eval 64 --eval-freq 100 \
  --steps-per-segment 25 --batch-size 256 --replay-capacity 131072 \
  --warmup-steps 40 --num-train-batches 5000 \
  --reward-scale 0.1 --grad-clip 10 --lr-schedule cosine \
  --seed 0 --metrics-jsonl runs/sac_lowdim_s0.jsonl
T=3700 step sac_pixels python -m cartpoleplusplus_tpu.agents.sac \
  --use-raw-pixels --num-cameras 2 --obs-pool 2 --pixel-encoder conv \
  --num-envs 512 --num-eval 64 --eval-freq 500 \
  --steps-per-segment 25 --batch-size 256 --replay-capacity 65536 \
  --warmup-steps 40 --num-train-batches 15000 \
  --actor-learning-rate 1e-4 --critic-learning-rate 3e-4 --lr-schedule cosine \
  --reward-scale 0.1 --grad-clip 10 --aug-shift 2 \
  --pallas-render \
  --ckpt-dir runs/ckpt_sac_pixels --ckpt-freq 5000 --ckpt-skip-replay \
  --seed 0 --metrics-jsonl runs/sac_pixels_s0.jsonl
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
  --ckpt-dir runs/ckpt_td3_2cam_s1 --ckpt-freq 5000 --ckpt-skip-replay \
  --seed 0 --metrics-jsonl runs/ddpg_pixels_td3_2cam_s1.jsonl

note "queue5 complete"


note "queue5 complete (incl. appended cells)"

# --- 7. serving-artifact evidence on chip (round-4c) --------------------------
# Export the trained pixel-TD3 policy straight from its checked-in
# checkpoint (--eval-only: no training segment) and time the serialized-
# StableHLO artifact at serving batch on the real chip (utils/export.py).
T=1800 step export_td3_policy bash -c '
  python -m cartpoleplusplus_tpu.agents.ddpg \
    --use-raw-pixels --num-cameras 2 --obs-pool 2 --pixel-encoder conv \
    --num-envs 512 --num-eval 64 \
    --steps-per-segment 25 --batch-size 256 --replay-capacity 65536 \
    --warmup-steps 40 --num-train-batches 15000 \
    --twin-critic --policy-delay 2 --target-noise 0.2 \
    --ckpt-dir runs/ckpt_pixels_td3 --eval-only \
    --export-policy runs/policy_td3_pixels.stablehlo \
    --metrics-jsonl runs/td3_eval_only.jsonl \
  && python -m cartpoleplusplus_tpu.utils.export \
    --load runs/policy_td3_pixels.stablehlo --batch 4096 --steps 30
'
