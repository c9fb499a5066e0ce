#!/bin/bash
# Round-5 continuation queue v2: split attention step under the
# head-compressed residuals (m/den as [N,H]; the [N,H*F] f-replicated
# tables put the split backward 855 MB over the 15.75 GB chip), then the
# split-program attention TRAINER at products scale, then the v2 step.
cd /root/repo || exit 1
LOG=/tmp/r5c_gat_queue.log
DEADLINE=$(( $(date +%s) + ${QUEUE_BUDGET_S:-2400} ))

run_one() {
  [ "$(date +%s)" -gt "$DEADLINE" ] && { echo "deadline reached" >> "$LOG"; exit 0; }
  echo "=== run=$* start=$(date +%H:%M:%S)" >> "$LOG"
  timeout "$1" python "${@:2}" >> "$LOG" 2>&1
  echo "=== run=$* rc=$? end=$(date +%H:%M:%S)" >> "$LOG"
  sleep 5
}

run_one 760 tools/bench_gat_products_r4.py --case gat_step2
run_one 900 tools/products_attn_train.py --memstats --max_wall_s 300 --epochs 40
run_one 760 tools/bench_gat_products_r4.py --case gatv2_step2
run_one 760 tools/bench_gat_products_r4.py --case gat_step2
echo "queue done" >> "$LOG"
