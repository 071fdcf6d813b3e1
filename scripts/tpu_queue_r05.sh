#!/bin/bash
# Round-5 TPU queue: run back-to-back in ONE window (BENCH DISCIPLINE —
# window-to-window tunnel variance is +-30%; treat each process's first
# run as warm-up). Results append to TPU_QUEUE_r05.log.
# regression_probes intentionally faults the worker, so it is NOT part of
# this queue — run it separately AFTER all benches:
#   python -c "exec(open('scripts/regression_probes.py').read())"
cd /root/repo || exit 1
LOG=TPU_QUEUE_r05.log
stamp() { date +"%F %T"; }

echo "=== tpu_queue_r05 start $(stamp)" >> "$LOG"

echo "--- bench lift (sanity, device_fetch + 80-row envelope) $(stamp)" >> "$LOG"
timeout 900 python bench.py >> "$LOG" 2>&1

echo "--- bench e2e fast profile (MASK_BENCH_r05 composed points) $(stamp)" >> "$LOG"
timeout 3600 python bench.py --stage e2e --profile fast >> "$LOG" 2>&1

echo "--- bench e2e exact $(stamp)" >> "$LOG"
timeout 2400 python bench.py --stage e2e >> "$LOG" 2>&1

echo "--- gdino async A/B (was 8163 ms/kf sync) $(stamp)" >> "$LOG"
timeout 3600 python -c "exec(open('scripts/bench_gdino.py').read())" >> "$LOG" 2>&1

echo "--- entry compile check $(stamp)" >> "$LOG"
timeout 900 python __graft_entry__.py >> "$LOG" 2>&1

echo "=== tpu_queue_r05 done $(stamp)" >> "$LOG"
