#!/usr/bin/env bash
# Round-3 artifact run: the TD3 pixel recipe (scripts/pixel_td3_sweep.sh) with
# production checkpointing (--ckpt-skip-replay keeps saves <100 MB) and
# eval-episode event recording, so the repo carries (a) a restorable trained
# pixel checkpoint and (b) a rendered GIF of the trained pixel policy — the
# reference README's evidence format (SURVEY.md §6), pixel edition.
#
# BATCHES must FINISH inside the timeout: eval events are recorded after
# training, so a timeout kill loses the GIF deliverable, not just the tail
# of the curve.  15000 batches ≈ 40 min on the v5e chip (sweep-measured);
# 25000 does NOT fit 3600 s — raise the timeout if you raise BATCHES.
set -euo pipefail
OUT=${OUT:-runs}
SEED=${SEED:-0}
mkdir -p "$OUT/gifs" "$OUT/ckpt_pixels_td3"

timeout 3600 python -m cartpoleplusplus_tpu.agents.ddpg \
  --use-raw-pixels --num-cameras 2 --obs-pool 2 --pixel-encoder conv \
  --num-envs 512 --num-eval 64 --eval-freq 500 \
  --steps-per-segment 25 --batch-size 256 --replay-capacity 65536 \
  --warmup-steps 40 --num-train-batches "${BATCHES:-15000}" \
  --actor-learning-rate 1e-4 --critic-learning-rate 3e-4 --lr-schedule cosine \
  --reward-scale 0.1 --grad-clip 10 --aug-shift 2 \
  --ou-sigma-min 0.05 --ou-decay-steps 250000 \
  --twin-critic --policy-delay 2 --target-noise 0.2 \
  --pallas-render \
  --ckpt-dir "$OUT/ckpt_pixels_td3" --ckpt-freq 5000 --ckpt-skip-replay \
  --event-log-out "$OUT/ddpg_pixels_td3_eval.events" \
  --seed "$SEED" --metrics-jsonl "$OUT/ddpg_pixels_td3_art.jsonl" \
  2>&1 | grep -v WARNING | tail -3

python -m cartpoleplusplus_tpu.utils.event_log \
  --log-file "$OUT/ddpg_pixels_td3_eval.events" \
  --gif-out "$OUT/gifs" --gif-size 100 --gif-scale 3
