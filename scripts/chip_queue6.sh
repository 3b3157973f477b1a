#!/usr/bin/env bash
# Round-5 chip queue — VERDICT r4 "Next round" items, in judge-priority
# order.  Same /tmp/chipq logs + resumability contract as chip_queue.sh:
# a step whose previous run completed cleanly (END … exit=0 in queue.log,
# no structured {"error"} row in its log) is skipped on relaunch, long
# learning cells resume from their own checkpoints, and the queue
# re-probes the tunnel between steps so an outage pauses rather than
# burns it.
#
# Priority order:
#   1. bench suite (VERDICT item 2: warm the compile cache so the driver's
#      round-end BENCH_r05 capture lands on hot rows; also persists the
#      last_measured provenance block).
#   2. full-scale Rainbow DQN (item 1: the round-4 evidence cell that
#      crashed on the C51 device-constant bug — now fixed + guarded).
#   3. serving artifact on chip (item 4: export + load + time StableHLO).
#   4. SAC low-dim 3 seeds with the --alpha-min churn fix (item 3).
#   5. PPO chip seeds (item 8).
#   6. 2-cam raster-vs-slab learning A/B at the validated samples=2
#      production pixel config (item 7).
#   7. opportunistic: pixel-SAC seed 1.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chipq
mkdir -p "$LOG"
note() { echo "[$(date -u '+%H:%M:%S')] $*" | tee -a "$LOG/queue.log"; }

# Leave the chip to the driver well before round end (wall ~11 h).
DEADLINE_TS=${DEADLINE_TS:-$(($(date +%s) + 30600))}

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

# NOTE: queue.log is shared across queue versions and cell names recur
# (dqn_rainbow, export_td3_policy ran in chip_queue5 too).  /tmp is wiped
# between driver rounds so collisions don't arise in practice, but if you
# ever relaunch a NEW queue definition against an old /tmp/chipq, clear the
# dir first — already_done would otherwise skip cells based on stale runs
# of older code.
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

export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

# --- 1. BENCH_r05 cache warm + last_measured seed -----------------------------
T=5400 step bench_suite python bench.py

# --- 2. full-scale Rainbow DQN (the round-4 crashed cell, re-queued) ----------
# 50000 segments promised by BASELINE round-4b; checkpoint-resumable so a
# timeout or tunnel flap continues instead of restarting.
T=9000 step dqn_rainbow python -m cartpoleplusplus_tpu.agents.dqn \
  --num-envs 128 --num-eval 64 --eval-freq 500 \
  --steps-per-segment 25 --batch-size 256 --replay-capacity 131072 \
  --warmup-steps 40 --num-train-batches 50000 \
  --lr-schedule cosine --reward-scale 0.1 --grad-clip 10 \
  --per --n-step 3 --dueling --c51 51 --c51-vmax 10 --noisy \
  --ckpt-dir runs/ckpt_dqn_rainbow --ckpt-freq 5000 --ckpt-skip-replay \
  --seed 0 --metrics-jsonl runs/dqn_rainbow_s0.jsonl

# --- 3. serving artifact on chip (deadline-dropped in round 4) -----------------
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

# --- 4. SAC low-dim, 3 seeds, churn-fixed recipe ------------------------------
# --alpha-min 0.02: the temperature floor (agents/sac.py) — the round-4
# chip run solved by segment 600 then decayed to 83 as alpha annealed to
# ~8e-4.  CPU floor-vs-control race validated the recipe before queueing.
for s in 0 1 2; do
T=2700 step sac_lowdim_fix_s$s python -m cartpoleplusplus_tpu.agents.sac \
  --num-envs 128 --num-eval 64 --eval-freq 100 \
  --steps-per-segment 25 --batch-size 256 --replay-capacity 131072 \
  --warmup-steps 40 --num-train-batches 5000 \
  --reward-scale 0.1 --grad-clip 10 --lr-schedule cosine \
  --alpha-min 0.02 \
  --seed $s --metrics-jsonl runs/sac_lowdim_fix_s$s.jsonl
done

# --- 5. PPO chip seeds (currently CPU-only evidence) ---------------------------
# The validated CPU recipe (BASELINE round-4): 128 envs x 128 rollout,
# 4 epochs x 8 minibatches, cosine 3e-4, 600 updates = 9.8M env steps.
for s in 0 1 2; do
T=3000 step ppo_lowdim_s$s python -m cartpoleplusplus_tpu.agents.ppo \
  --num-envs 128 --num-eval 64 --eval-freq 25 \
  --rollout-steps 128 --ppo-epochs 4 --ppo-minibatches 8 \
  --learning-rate 3e-4 --lr-schedule cosine \
  --reward-scale 0.1 --grad-clip 0.5 \
  --num-train-batches 600 \
  --seed $s --metrics-jsonl runs/ppo_lowdim_s$s.jsonl
done

# --- 6. 2-cam raster-vs-slab learning A/B (same seed, samples=2 config) -------
# The promoted raster default's multi-camera learning validation (VERDICT
# weak #3): identical recipe to the slab-era ddpg_pixels_2cam_samples2
# runs, backend the only variable.
for backend in raster slab; do
  flag=--render-raster; [ $backend = slab ] && flag=--no-render-raster
T=3700 step ab_2cam_$backend python -m cartpoleplusplus_tpu.agents.ddpg \
  --use-raw-pixels --num-cameras 2 --obs-pool 2 --obs-samples 2 \
  --pixel-encoder conv \
  --num-envs 512 --num-eval 64 --eval-freq 500 \
  --steps-per-segment 25 --batch-size 256 --replay-capacity 65536 \
  --warmup-steps 40 --num-train-batches 15000 \
  --actor-learning-rate 1e-4 --critic-learning-rate 3e-4 --lr-schedule cosine \
  --reward-scale 0.1 --grad-clip 10 --aug-shift 2 \
  --ou-sigma-min 0.05 --ou-decay-steps 250000 \
  --twin-critic --policy-delay 2 --target-noise 0.2 \
  --pallas-render $flag \
  --ckpt-dir runs/ckpt_ab_2cam_$backend --ckpt-freq 5000 --ckpt-skip-replay \
  --seed 0 --metrics-jsonl runs/ddpg_ab_2cam_$backend.jsonl
done

# --- 7. opportunistic: pixel-SAC seed 1 (churn-fixed) --------------------------
T=3700 step sac_pixels_s1 python -m cartpoleplusplus_tpu.agents.sac \
  --use-raw-pixels --num-cameras 2 --obs-pool 2 --pixel-encoder conv \
  --num-envs 512 --num-eval 64 --eval-freq 500 \
  --steps-per-segment 25 --batch-size 256 --replay-capacity 65536 \
  --warmup-steps 40 --num-train-batches 15000 \
  --actor-learning-rate 1e-4 --critic-learning-rate 3e-4 --lr-schedule cosine \
  --reward-scale 0.1 --grad-clip 10 --aug-shift 2 --alpha-min 0.02 \
  --pallas-render \
  --ckpt-dir runs/ckpt_sac_pixels_s1 --ckpt-freq 5000 --ckpt-skip-replay \
  --seed 1 --metrics-jsonl runs/sac_pixels_s1.jsonl

# --- 8. final bench warm (cell 1 may have hit a tunnel flap cold) -------------
# The driver's round-end BENCH_r05 capture needs hot compile caches; this
# re-warm runs after the learning cells so the rows are as fresh as
# possible.  already_done skips it only if a previous pass ran it cleanly.
T=5400 step bench_suite_final python bench.py

note "queue6 complete"

# --- 9. (appended mid-round) on-chip render-diff probe ------------------------
# The ab_2cam_raster cell flatlined at the nop baseline while interpret-mode
# math is byte-exact — this separates a Mosaic miscompile of the raster
# kernel at samples=2 from a recipe-level failure.
T=900 step render_diff python scripts/render_diff_probe.py
note "queue6 complete (incl. appended probe)"

# --- 10. (appended) in-jit venv obs diff: the REAL training render path -------
T=1200 step venv_obs_diff python scripts/venv_obs_diff_probe.py
note "queue6 complete (incl. venv obs probe)"

# --- 11. (appended) first-divergence probe: the REAL fused train segment ----
T=1500 step train_segment_diff python scripts/train_segment_diff_probe.py

# --- 12. (appended) raster-flatline seed sweep: is the 2-cam samples=2
# raster flatline systematic (backend-caused) or one-seed actor-collapse
# chaos?  Short horizon (2000 segments, eval every 100): the original A/B
# showed the signature (double_reset pinned ~0.82, eval ~4.7) from the
# first logged row, so 2000 segments decide per seed in ~6 min.
for s in 1 2; do
  for backend in raster slab; do
    flag=--render-raster; [ $backend = slab ] && flag=--no-render-raster
T=1500 step ab2k_${backend}_s$s python -m cartpoleplusplus_tpu.agents.ddpg \
  --use-raw-pixels --num-cameras 2 --obs-pool 2 --obs-samples 2 \
  --pixel-encoder conv \
  --num-envs 512 --num-eval 64 --eval-freq 100 \
  --steps-per-segment 25 --batch-size 256 --replay-capacity 65536 \
  --warmup-steps 40 --num-train-batches 2000 \
  --actor-learning-rate 1e-4 --critic-learning-rate 3e-4 --lr-schedule cosine \
  --reward-scale 0.1 --grad-clip 10 --aug-shift 2 \
  --ou-sigma-min 0.05 --ou-decay-steps 250000 \
  --twin-critic --policy-delay 2 --target-noise 0.2 \
  --pallas-render $flag \
  --seed $s --metrics-jsonl runs/ddpg_ab2k_${backend}_s$s.jsonl
  done
done
note "queue6 complete (incl. flatline seed sweep)"

# --- 13. (appended) pixel-SAC 3-seed bar: s1 hit a sustained-200 perfect
# run; s0 (round-4 floorless, peaked 153->109) re-run with the floor, plus
# a fresh s2 — same recipe as sac_pixels_s1.
for s in 0 2; do
T=3700 step sac_pixels_fix_s$s python -m cartpoleplusplus_tpu.agents.sac \
  --use-raw-pixels --num-cameras 2 --obs-pool 2 --pixel-encoder conv \
  --num-envs 512 --num-eval 64 --eval-freq 500 \
  --steps-per-segment 25 --batch-size 256 --replay-capacity 65536 \
  --warmup-steps 40 --num-train-batches 15000 \
  --actor-learning-rate 1e-4 --critic-learning-rate 3e-4 --lr-schedule cosine \
  --reward-scale 0.1 --grad-clip 10 --aug-shift 2 --alpha-min 0.02 \
  --pallas-render \
  --ckpt-dir runs/ckpt_sac_pixels_s$s --ckpt-freq 5000 --ckpt-skip-replay \
  --seed $s --metrics-jsonl runs/sac_pixels_fix_s$s.jsonl
done
note "queue6 complete (incl. pixel-SAC seeds)"
