#!/usr/bin/env bash
# Round-3 pixel-DDPG robustness sweep (VERDICT r2 weak #4 / next-step 4):
# the validated round-2 recipe (conv encoder on obs_pool=2 frames, DrQ
# random-shift aug, cosine lr, OU annealing, reward-scale 0.1, grad-clip 10)
# PLUS the TD3 stabilizer stack — twin critics (clipped double-Q), delayed
# policy, target-policy smoothing — against the documented seed-2
# instant-terminate collapse.  Target: 4/4 seeds >=100 final, best >=150.
# One chip serves the runs sequentially (~40 min each).
set -euo pipefail
OUT=${OUT:-runs}
mkdir -p "$OUT"

for seed in ${SEEDS:-0 1 2 3}; do
  # `|| true`: a hung/timed-out seed (e.g. a TPU-tunnel outage) must not
  # abort the remaining seeds under `set -e`.
  timeout 3600 python -m cartpoleplusplus_tpu.agents.ddpg \
    --use-raw-pixels --num-cameras 2 --obs-pool 2 --pixel-encoder conv \
    --num-envs 512 --num-eval 64 --eval-freq 500 \
    --steps-per-segment 25 --batch-size 256 --replay-capacity 65536 \
    --warmup-steps 40 --num-train-batches 15000 \
    --actor-learning-rate 1e-4 --critic-learning-rate 3e-4 --lr-schedule cosine \
    --reward-scale 0.1 --grad-clip 10 --aug-shift 2 \
    --ou-sigma-min 0.05 --ou-decay-steps 250000 \
    --twin-critic --policy-delay 2 --target-noise 0.2 \
    --pallas-render \
    --seed "$seed" --metrics-jsonl "$OUT/ddpg_pixels_td3_s${seed}.jsonl" \
    2>&1 | grep -v WARNING | tail -2 || true
done
