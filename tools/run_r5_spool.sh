#!/bin/bash
# Round-5 sequential TPU task spool. One TPU client at a time; tasks are
# shell command lines in /tmp/r5spool/NNN_name.task, executed in lexical
# order, each in a fresh process under timeout. New tasks may be dropped in
# while the runner is live (never edit a running script — CLAUDE.md); the
# runner idles until DEADLINE waiting for more work.
#
#   TASK file line 1: the command (run with bash -c, cwd /root/repo)
#   optional line 2:  TIMEOUT=<seconds>   (default 1200)
#
# Start:  QUEUE_BUDGET_S=nnn nohup bash tools/run_r5_spool.sh &
cd /root/repo || exit 1
SPOOL=/tmp/r5spool
LOG=/tmp/r5_queue.log
mkdir -p "$SPOOL/done"
DEADLINE=$(( $(date +%s) + ${QUEUE_BUDGET_S:-10800} ))
echo "spool runner up $(date +%H:%M:%S), deadline in ${QUEUE_BUDGET_S:-10800}s" >> "$LOG"

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  next=$(ls "$SPOOL"/*.task 2>/dev/null | sort | head -1)
  if [ -z "$next" ]; then
    sleep 15
    continue
  fi
  name=$(basename "$next")
  cmd=$(sed -n 1p "$next")
  to=$(sed -n 2p "$next" | grep -o '[0-9]*')
  to=${to:-1200}
  # stop-file lets the session halt the queue without pattern-kills
  [ -f "$SPOOL/STOP" ] && { echo "STOP file seen" >> "$LOG"; exit 0; }
  echo "=== task=$name start=$(date +%H:%M:%S) timeout=${to}s" >> "$LOG"
  echo "    cmd: $cmd" >> "$LOG"
  timeout "$to" bash -c "$cmd" >> "$LOG" 2>&1
  rc=$?
  echo "=== task=$name rc=$rc end=$(date +%H:%M:%S)" >> "$LOG"
  mv "$next" "$SPOOL/done/$name"
  if [ "$rc" -ge 124 ]; then
    # a killed TPU client leaves a stale tunnel lease for minutes; space
    # the next client start (CLAUDE.md round-2 lesson)
    sleep 120
  else
    sleep 10
  fi
done
echo "spool runner deadline $(date +%H:%M:%S)" >> "$LOG"
