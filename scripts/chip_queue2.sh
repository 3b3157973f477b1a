#!/usr/bin/env bash
# Follow-up chip queue (round 4, after scripts/chip_queue.sh drains).
#
# The round-4 races decided raster-vs-slab for 1-cam exact and config-5
# (BASELINE.md round 4) and render.prefer_raster shipped with the narrow,
# measurement-backed rule.  These cells fill in the rule's unraced corners
# (slab counterparts for the sampled / 2-cam-exact configs), remeasure the
# two low-dim rows whose first run predates the bench's min-wall window
# auto-extension, and re-run the headline triple under the new per-config
# auto defaults (also re-warms the driver's BENCH_r04 compile cache).
#
# Same /tmp/chipq log dir + resumability contract as chip_queue.sh.
# WAIT_PID (default: any running chip_queue.sh found at launch) is waited
# on — liveness-checked by PID, never killed — so the two queues can't
# contend for the single chip.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chipq
mkdir -p "$LOG"
note() { echo "[$(date -u '+%H:%M:%S')] $*" | tee -a "$LOG/queue.log"; }

DEADLINE_TS=${DEADLINE_TS:-$(($(date +%s) + 28800))}

WAIT_PID=${WAIT_PID:-}
if [ -n "$WAIT_PID" ]; then
  note "queue2: waiting for queue1 (pid $WAIT_PID) to exit"
  while kill -0 "$WAIT_PID" 2>/dev/null; do
    if [ "$(date +%s)" -gt "$DEADLINE_TS" ]; then
      note "queue2: deadline passed while waiting for queue1; exiting"
      exit 0
    fi
    sleep 60
  done
  note "queue2: queue1 exited; starting"
fi

probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
assert float(jnp.sum(jnp.ones((8, 8)))) == 64.0
" >/dev/null 2>&1
}

ensure_up() {
  for _ in $(seq 1 80); do
    probe && return 0
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

# --- 1. slab counterparts for prefer_raster's unraced corners ---------------
# 2-cam exact (the agents' pixel-recipe config): rule says raster (measured
# 815k = 90% of its ceiling); confirm slab really sits lower.
step slab_2cam_exact python bench.py --single --num-cameras 2 --obs-samples 0 --no-render-raster
# Single-camera sampled rows currently keep raster (rule's pending corner):
# raster measured 2.071M (s2) / 2.393M (s1).  If slab wins either, flip
# prefer_raster for 1-cam sampled configs too.
step slab_1cam_s2 python bench.py --single --num-cameras 1 --obs-samples 2 --no-render-raster
step slab_1cam_s1 python bench.py --single --num-cameras 1 --obs-samples 1 --no-render-raster
# 2-cam samples=1: rule picked slab by monotonicity from config-5; measure.
step slab_2cam_s1 python bench.py --single --num-cameras 2 --obs-samples 1 --no-render-raster

# --- 2. long-window remeasures (rows that predate --min-wall-s) -------------
step lowdim_16384_seg25 python bench.py --lowdim --num-envs 16384 --replay-capacity 32768 --segments 25
step lowdim_4096_it3_seg25 python bench.py --lowdim --num-envs 4096 --replay-capacity 8192 --solver-iters 3 --segments 25

# --- 3. headline triple under the new per-config auto defaults --------------
T=5400 step bench_triple_auto python bench.py
note "queue2 complete"
