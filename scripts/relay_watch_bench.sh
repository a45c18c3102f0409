#!/bin/bash
# Poll the axon relay; when it answers, run the queued TPU validation batch
# (DEVNOTES.md: batch TPU work across relay outages, one job at a time).
set -u
LOG=/tmp/relay_bench.log
for i in $(seq 1 720); do
  code=$(curl -s -o /dev/null -w "%{http_code}" -m 10 http://127.0.0.1:8103/health || true)
  if [ "$code" != "000" ] && [ -n "$code" ]; then
    echo "relay up (code $code) after $i polls" | tee -a "$LOG"
    cd /root/repo
    echo "=== bench.py (confirm batched encoder)" >> "$LOG"
    timeout 1800 python -u bench.py --no-train >> "$LOG" 2>&1
    echo "bench rc=$?" >> "$LOG"
    echo "=== bench_train.py" >> "$LOG"
    timeout 2400 python -u bench_train.py >> "$LOG" 2>&1
    echo "train rc=$?" >> "$LOG"
    exit 0
  fi
  sleep 30
done
echo "relay never returned" | tee -a "$LOG"
