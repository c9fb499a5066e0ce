#!/bin/bash
# Chained retry: products attention trainer WITHOUT --memstats (the AOT
# memstats pass double-compiles P1/P3 and ate the whole 900 s window).
# Waits for the r5c queue to release the TPU; hard entry cutoff so it
# cannot collide with the driver's end-of-round bench.
cd /root/repo || exit 1
LOG=/tmp/r5d_trainer.log
CUTOFF=$(( $(date +%s) + ${ENTRY_BUDGET_S:-1500} ))

while ! grep -q "queue done" /tmp/r5c_gat_queue.log 2>/dev/null; do
  [ "$(date +%s)" -gt "$CUTOFF" ] && { echo "cutoff before queue end" >> "$LOG"; exit 1; }
  sleep 15
done
sleep 10
echo "=== trainer start=$(date +%H:%M:%S)" >> "$LOG"
timeout 1100 python tools/products_attn_train.py --max_wall_s 600 --epochs 60 >> "$LOG" 2>&1
echo "=== trainer rc=$? end=$(date +%H:%M:%S)" >> "$LOG"
