#!/usr/bin/env bash
# Round-4b chip queue: every cell still unmeasured after the round-4
# morning drain, re-armed for the restarted session (/tmp — and with it
# /tmp/chipq and the jax compile cache — was wiped, so resumability state
# is gone; results already folded into BASELINE.md are NOT re-queued).
#
# Priority order:
#   1. ddpg_it3_learn — the ONLY gate left on flipping the solver default
#      to 3 iterations (fidelity + throughput already measured: 18.4M vs
#      15.5M steps/s).  If its final evals reach the validated recipe's
#      >=190, the default flips and the low-dim headline moves +19%.
#   2. hoisted-raster race decision cells (chip_queue3 rationale): does
#      _pack_setups take config-5 from the slab?  1-cam exact headline.
#   3. bench triple — warms the driver's BENCH_r04 compile cache under
#      the shipping defaults (cache was wiped with /tmp).
#   4. it3 long-window low-dim remeasures (headline candidates).
#   5. prefer_raster's remaining corners (hoisted raster vs slab).
#   6. big learning cells (td3 2cam-s1 validation, SAC chip evidence).
#
# Same resumability contract as chip_queue.sh (clean END + no '"error"'
# row => skipped on relaunch).  Logs: /tmp/chipq/<step>.log.
#
# Cold-cache note: with /tmp/jax_cache empty even the trivial probe
# program pays a multi-minute remote compile, so the FIRST probe gets
# 600 s; once it has passed once, later probes are warm and keep 90 s.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chipq
mkdir -p "$LOG"
note() { echo "[$(date -u '+%H:%M:%S')] $*" | tee -a "$LOG/queue.log"; }

# Driver needs the chip free for round-end BENCH/entry checks.
DEADLINE_TS=${DEADLINE_TS:-$(($(date +%s) + 7200))}

PROBE_T=600  # first probe: cold-cache compile through the tunnel
probe() {
  timeout "$PROBE_T" python -c "
import jax, jax.numpy as jnp
assert float(jnp.sum(jnp.ones((8, 8)))) == 64.0
" >/dev/null 2>&1 && { PROBE_T=90; return 0; }
  return 1
}

ensure_up() {  # block until the tunnel answers (re-probe every 3 min)
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

# --- 1. solver default-flip gate (the one open round-4 decision) ------------
T=2700 step ddpg_it3_learn python -m cartpoleplusplus_tpu.agents.ddpg \
  --solver-iters 3 \
  --num-envs 128 --num-eval 64 --eval-freq 100 \
  --steps-per-segment 25 --batch-size 256 --replay-capacity 131072 \
  --warmup-steps 40 --num-train-batches 1500 \
  --reward-scale 0.1 --grad-clip 10 \
  --seed 0 --metrics-jsonl runs/ddpg_it3_s0.jsonl

# --- 2. hoisted-raster decision cells (chip_queue3 priorities 1-2) ----------
step hoist_raster_cfg5 python bench.py --single --num-cameras 2 --obs-samples 2 --render-raster
step hoist_raster_1cam python bench.py --single --num-cameras 1 --obs-samples 0 --render-raster

# --- 3. BENCH_r04 cache warm under shipping defaults -------------------------
T=5400 step bench_triple_auto python bench.py

# --- 4. it3 long-window low-dim remeasures (headline candidates) -------------
step lowdim_4096_it3_seg25 python bench.py --lowdim --num-envs 4096 --replay-capacity 8192 --solver-iters 3 --segments 25
step lowdim_16384_it3 python bench.py --lowdim --num-envs 16384 --replay-capacity 32768 --solver-iters 3 --segments 25
step lowdim_16384_seg25 python bench.py --lowdim --num-envs 16384 --replay-capacity 32768 --segments 25

# --- 5. prefer_raster remaining corners (hoisted raster vs slab) -------------
step hoist_raster_2cam_exact python bench.py --single --num-cameras 2 --obs-samples 0 --render-raster
step slab_2cam_exact python bench.py --single --num-cameras 2 --obs-samples 0 --no-render-raster
step hoist_raster_1cam_s1 python bench.py --single --num-cameras 1 --obs-samples 1 --render-raster
step slab_1cam_s1 python bench.py --single --num-cameras 1 --obs-samples 1 --no-render-raster
step hoist_raster_1cam_s2 python bench.py --single --num-cameras 1 --obs-samples 2 --render-raster
step slab_1cam_s2 python bench.py --single --num-cameras 1 --obs-samples 2 --no-render-raster
step hoist_raster_2cam_s1 python bench.py --single --num-cameras 2 --obs-samples 1 --render-raster
step slab_2cam_s1 python bench.py --single --num-cameras 2 --obs-samples 1 --no-render-raster

# --- 6. big learning cells (opportunistic) -----------------------------------
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
  --seed 0 --metrics-jsonl runs/sac_pixels_s0.jsonl

note "queue4 complete"
