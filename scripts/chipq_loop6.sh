#!/usr/bin/env bash
# Relaunch chip_queue6 until a full pass adds no new completed cells (the
# tunnel flaps; each pass retries exactly the cells whose logs carry a
# structured {"error"} row or a non-zero END — already_done skips clean
# ones, long learning cells resume from their checkpoints).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chipq
mkdir -p "$LOG"
DEADLINE_TS="${DEADLINE_TS:-$(($(date +%s) + 30600))}"
export DEADLINE_TS
for pass in 1 2 3 4 5 6 7 8; do
  before=$(grep -c "END .* exit=0" "$LOG/queue.log" 2>/dev/null || echo 0)
  echo "[loop] pass $pass (clean-END count before: $before)" >> "$LOG/queue.log"
  bash scripts/chip_queue6.sh
  if [ "$(date +%s)" -gt "$DEADLINE_TS" ]; then break; fi
  # Stop when every cell is clean (chip_queue6 SKIPs them all in <1 min).
  after=$(grep -c "END .* exit=0" "$LOG/queue.log" 2>/dev/null || echo 0)
  retry=$(grep -l '"error"' "$LOG"/*.log 2>/dev/null | wc -l)
  [ "$retry" -eq 0 ] && grep -q "queue6 complete" "$LOG/queue.log" && break
  sleep 60
done
echo "[loop] done" >> "$LOG/queue.log"
