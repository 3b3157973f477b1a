#!/usr/bin/env bash
# Hyperparameter / agent sweep driver (rebuild of the reference's run_*.sh
# convention, SURVEY.md §2.1 "uncertain extras").  Each run writes metrics
# JSONL under runs/; plot with:
#   python -m cartpoleplusplus_tpu.utils.plots runs/sweep_*.jsonl -o sweep.png
set -euo pipefail

OUT=${OUT:-runs}
COMMON=${COMMON:---num-envs 128 --num-eval 64 --eval-freq 100 \
  --steps-per-segment 25 --batch-size 256 --replay-capacity 131072 \
  --warmup-steps 40}
mkdir -p "$OUT"

for seed in 0 1 2; do
  python -m cartpoleplusplus_tpu.agents.ddpg $COMMON \
    --num-train-batches "${BATCHES:-1500}" \
    --reward-scale 0.1 --grad-clip 10 \
    --seed "$seed" --metrics-jsonl "$OUT/sweep_ddpg_s${seed}.jsonl" &
  wait $!   # one at a time: a single chip serves the runs
done

for seed in 0 1 2; do
  python -m cartpoleplusplus_tpu.agents.naf $COMMON \
    --num-train-batches "${BATCHES:-1500}" \
    --reward-scale 0.1 --grad-clip 10 \
    --seed "$seed" --metrics-jsonl "$OUT/sweep_naf_s${seed}.jsonl" &
  wait $!
done
