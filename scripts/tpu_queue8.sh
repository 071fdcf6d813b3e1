#!/bin/bash
# Session-12 queue #8: serving-path validation on the real chip.
set -u
cd /root/repo
LOG=/root/repo/TPU_QUEUE_r03.log

step() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name (timeout ${tmo}s) $(date +%H:%M:%S) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "--- $name exit=$? $(date +%H:%M:%S)" | tee -a "$LOG"
}

step bench_sanity 1800 python bench.py
step entry_compile 1800 python __graft_entry__.py
step serve_check 1800 python -c "exec(open('scripts/serve_tpu_check.py').read())"
step lift_profile 1800 python -c "exec(open('scripts/profile_lift3.py').read())"
echo "QUEUE8 DONE $(date +%H:%M:%S)" | tee -a "$LOG"
# keep only valid JSON lines (the cumulative log contains an old
# Python-repr line with single quotes that json consumers choke on)
grep -h '^{' "$LOG" 2>/dev/null | python -c '
import json, sys
for line in sys.stdin:
    try:
        json.loads(line)
    except ValueError:
        continue
    sys.stdout.write(line)
' > /root/repo/TPU_QUEUE_r03_bench_lines.jsonl || true
