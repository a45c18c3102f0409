#!/bin/bash
# Poll the axon relay; when it answers, run the production-scale quality
# harness on the real chip (fills QUALITY.md's TPU table).  One TPU job at
# a time (DEVNOTES.md relay rules).
set -u
LOG=/tmp/quality_tpu.log
for i in $(seq 1 720); do
  code=$(curl -s -o /dev/null -w "%{http_code}" -m 10 http://127.0.0.1:8103/health || true)
  if [ "$code" != "000" ] && [ -n "$code" ]; then
    echo "relay up (code $code) after $i polls; launching production quality run" | tee -a "$LOG"
    cd /root/repo
    timeout 5400 python -u benchmarks/quality_harness.py --production \
      --out results/quality_tpu >> "$LOG" 2>&1
    echo "quality rc=$?" | tee -a "$LOG"
    exit 0
  fi
  sleep 30
done
echo "relay never returned" | tee -a "$LOG"
