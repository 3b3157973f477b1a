#!/usr/bin/env bash
# Round-4 queue 3: race the setup-hoisted raster kernel (render/pallas_kernel
# _pack_setups — per-env scalar setup moved to batched XLA) against the
# round-4 morning numbers, which were measured with the setup still inside
# the kernel:
#
#   config            pre-hoist raster   slab      decision at stake
#   config-5          977,745            1,047,373 flip prefer_raster to
#                                                  raster at cfg5 if the
#                                                  hoisted raster wins
#   1-cam exact       1,503,052          1,378,902 headline moves up
#   2-cam exact       815,240            (unraced) agents' pixel config
#   1-cam samples=2   2,071,481          queue2    rule corners
#   1-cam samples=1   2,393,388          queue2
#   2-cam samples=1   1,283,452          queue2
#
# Chains on queue2 by PID liveness (never kills).  Same /tmp/chipq logs +
# resumability contract as chip_queue.sh.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chipq
mkdir -p "$LOG"
note() { echo "[$(date -u '+%H:%M:%S')] $*" | tee -a "$LOG/queue.log"; }

DEADLINE_TS=${DEADLINE_TS:-$(($(date +%s) + 25200))}

WAIT_PID=${WAIT_PID:-}
if [ -n "$WAIT_PID" ]; then
  note "queue3: waiting for queue2 (pid $WAIT_PID) to exit"
  while kill -0 "$WAIT_PID" 2>/dev/null; do
    if [ "$(date +%s)" -gt "$DEADLINE_TS" ]; then
      note "queue3: deadline passed while waiting; exiting"
      exit 0
    fi
    sleep 60
  done
  note "queue3: queue2 exited; starting"
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

# Decision cell first: does the hoisted raster take config-5 from the slab?
step hoist_raster_cfg5 python bench.py --single --num-cameras 2 --obs-samples 2 --render-raster
step hoist_raster_1cam python bench.py --single --num-cameras 1 --obs-samples 0 --render-raster
step hoist_raster_2cam_exact python bench.py --single --num-cameras 2 --obs-samples 0 --render-raster
step hoist_raster_1cam_s2 python bench.py --single --num-cameras 1 --obs-samples 2 --render-raster
step hoist_raster_1cam_s1 python bench.py --single --num-cameras 1 --obs-samples 1 --render-raster
step hoist_raster_2cam_s1 python bench.py --single --num-cameras 2 --obs-samples 1 --render-raster

# Low-dim 3-iteration solver at 16384 envs (best measured so far: 18.4M at
# 8192; lane fill may push further).
step lowdim_16384_it3 python bench.py --lowdim --num-envs 16384 --replay-capacity 32768 --solver-iters 3 --segments 25

note "queue3 complete"
