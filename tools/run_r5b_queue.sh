#!/bin/bash
# Round-5 continuation queue: land the two-program attention STEP numbers
# (gat_step2 / gatv2_step2) at products scale, plus the packed-logit-table
# forward A/B queued last session. One fresh TPU client per case
# (CLAUDE.md r4 protocol: best-of-N draws; sentinel logged per process).
cd /root/repo || exit 1
LOG=/tmp/r5b_gat_queue.log
DEADLINE=$(( $(date +%s) + ${QUEUE_BUDGET_S:-3000} ))

while [ ! -f /tmp/products_lp.npz ]; do
  [ "$(date +%s)" -gt "$DEADLINE" ] && { echo "deadline before cache" >> "$LOG"; exit 1; }
  sleep 10
done
sleep 15

run_case() {
  [ "$(date +%s)" -gt "$DEADLINE" ] && { echo "deadline reached" >> "$LOG"; exit 0; }
  echo "=== case=$* start=$(date +%H:%M:%S)" >> "$LOG"
  timeout 780 python tools/bench_gat_products_r4.py "$@" >> "$LOG" 2>&1
  echo "=== case=$* rc=$? end=$(date +%H:%M:%S)" >> "$LOG"
  sleep 5
}

run_case --case gat_step2
run_case --case gat_step2
run_case --case gatv2_step2
run_case --case gat_step2
run_case --case gat_fwd --packed
run_case --case gat_fwd
run_case --case gatv2_step2
echo "queue done" >> "$LOG"
