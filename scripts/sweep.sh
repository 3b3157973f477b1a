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
  # Validated NAF recipe (runs/naf_anneal_s*.jsonl: all seeds >=196/200):
  # cosine lr decay + OU sigma annealing stop the late-training policy
  # churn that capped round-1 NAF at ~130.
  python -m cartpoleplusplus_tpu.agents.naf $COMMON \
    --num-train-batches "${BATCHES:-5000}" \
    --learning-rate 3e-4 --lr-schedule cosine \
    --reward-scale 0.1 --grad-clip 10 \
    --ou-sigma-min 0.05 --ou-decay-steps 100000 \
    --seed "$seed" --metrics-jsonl "$OUT/sweep_naf_s${seed}.jsonl" &
  wait $!
done

for seed in 0 1 2; do
  # SAC (beyond-parity; recipe validated round 5): the learned temperature
  # handles exploration decay, but NEEDS the --alpha-min floor — without it
  # alpha anneals to ~8e-4 once solved and the still-hot critic churns the
  # near-deterministic policy (round-4 chip run: 200 -> 83; with the floor:
  # finals 198.6/200.0 on chip, runs/sac_lowdim_fix_s*.jsonl).
  python -m cartpoleplusplus_tpu.agents.sac $COMMON \
    --num-train-batches "${BATCHES:-5000}" \
    --lr-schedule cosine --alpha-min 0.02 \
    --reward-scale 0.1 --grad-clip 10 \
    --seed "$seed" --metrics-jsonl "$OUT/sweep_sac_s${seed}.jsonl" &
  wait $!
done

for seed in 0 1 2; do
  # Full Rainbow DQN (beyond-parity, round 4b): all six components on the
  # validated round-2 DQN recipe shape.  --noisy replaces the eps schedule
  # with learned exploration; C51 support sized for reward-scale 0.1.
  python -m cartpoleplusplus_tpu.agents.dqn $COMMON \
    --num-train-batches "${BATCHES:-50000}" \
    --lr-schedule cosine --reward-scale 0.1 --grad-clip 10 \
    --per --n-step 3 --dueling --c51 51 --c51-vmax 10 --noisy \
    --seed "$seed" --metrics-jsonl "$OUT/sweep_rainbow_s${seed}.jsonl" &
  wait $!
done
