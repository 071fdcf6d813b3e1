#!/bin/bash
# Resume of scripts/tpu_queue.sh after the 02:54 session cutoff killed it
# mid ab_detic_int8. Appends to the persisted round log.
set -u
cd /root/repo
LOG=/root/repo/TPU_QUEUE_r03.log

step() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name (timeout ${tmo}s) $(date +%H:%M:%S) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "--- $name exit=$? $(date +%H:%M:%S)" | tee -a "$LOG"
}

step health 240 python -c "
import jax, numpy as np, jax.numpy as jnp
print(jax.devices()); print(float(np.asarray(jnp.sum(jnp.ones((128,128))))))"
grep -q -- '--- health exit=0' <(tail -5 "$LOG") || { echo 'tunnel unhealthy; aborting' | tee -a "$LOG"; exit 1; }

step ab_detic_int8 2400 python -c "exec(open('scripts/ab_detic_int8.py').read())"
step bench_e2e 3600 python bench.py --stage e2e
step bench_e2e_rect 3600 python bench.py --stage e2e --rect_encode
step bench_e2e_quant 3600 python bench.py --stage e2e --quant_int8
step bench_e2e_rect_quant 3600 python bench.py --stage e2e --rect_encode --quant_int8

echo "QUEUE DONE $(date +%H:%M:%S)" | tee -a "$LOG"
grep -h '^{' "$LOG" > /root/repo/TPU_QUEUE_r03_bench_lines.jsonl 2>/dev/null || true
