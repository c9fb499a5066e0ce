#!/bin/bash
# Sequential products-scale GAT/SAGE probe queue (one TPU client at a time;
# fresh process per case per the r4 measurement protocol). Self-bounded by
# DEADLINE so it cannot collide with the driver's end-of-round bench run.
cd /root/repo || exit 1
LOG=/tmp/r4b_gat_products.log
DEADLINE=$(( $(date +%s) + ${QUEUE_BUDGET_S:-1800} ))

# wait for the products cache (tools/products_cache.py) to finish writing
while [ ! -f /tmp/products_lp.npz ]; do
  [ "$(date +%s)" -gt "$DEADLINE" ] && { echo "deadline before cache" >> "$LOG"; exit 1; }
  sleep 10
done
sleep 15  # let the npz writer close the file

for case in gat_fwd gat_step sage_step gat_fwd gat_step sage_step gatv2_fwd; do
  [ "$(date +%s)" -gt "$DEADLINE" ] && { echo "deadline reached" >> "$LOG"; exit 0; }
  echo "=== case=$case start=$(date +%H:%M:%S)" >> "$LOG"
  timeout 900 python tools/bench_gat_products_r4.py --case "$case" >> "$LOG" 2>&1
  echo "=== case=$case rc=$? end=$(date +%H:%M:%S)" >> "$LOG"
  sleep 5
done
echo "queue done" >> "$LOG"
