#!/usr/bin/env bash
# Relaunch chip_queue5 until a full pass adds no new completed cells (the
# tunnel flaps every ~20 min; each pass retries exactly the cells whose
# logs carry a structured {"error"} row — already_done skips clean ones).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chipq
# Pin the deadline ONCE in the loop scope: a command-scoped default on the
# chip_queue5 line would leave the parent's check reading an unset var
# (fallback 0 -> always past deadline -> loop breaks after pass 1).
DEADLINE_TS="${DEADLINE_TS:-$(($(date +%s) + 5400))}"
export DEADLINE_TS
for pass in 1 2 3 4 5 6; do
  before=$(grep -c "END .* exit=0" "$LOG/queue.log" 2>/dev/null || echo 0)
  errors_before=$(grep -l '"error"' "$LOG"/*.log 2>/dev/null | wc -l)
  echo "[loop] pass $pass (clean-END count before: $before)" >> "$LOG/queue.log"
  bash scripts/chip_queue5.sh
  if [ "$(date +%s)" -gt "$DEADLINE_TS" ]; then break; fi
  errors_after=$(grep -l '"error"' "$LOG"/*.log 2>/dev/null | wc -l)
  # Stop when nothing is left to retry.
  [ "$errors_after" -eq 0 ] && break
  sleep 60
done
echo "[loop] done" >> "$LOG/queue.log"
