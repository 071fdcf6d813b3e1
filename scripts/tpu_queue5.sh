#!/bin/bash
# Session-11 queue part 2: finish the batch-16 lift crash bisection.
# Session-10 results: pallas arm crashes the worker, xla_compact arm
# (Pallas medoid still ON) runs fine at 72 kf/s — so the medoid kernel
# is exonerated; remaining question is fold-path (D=12 union channels)
# vs the base compact kernel. Crash-prone arm order: least->most risky.
set -u
cd /root/repo
LOG=/root/repo/TPU_QUEUE_r03.log

step() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name (timeout ${tmo}s) $(date +%H:%M:%S) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "--- $name exit=$? $(date +%H:%M:%S)" | tee -a "$LOG"
}

health() {
  for i in 1 2 3; do
    step "health_b16_$1_$i" 240 python -c "
import jax, numpy as np, jax.numpy as jnp
print(jax.devices()); print(float(np.asarray(jnp.sum(jnp.ones((128,128))))))"
    grep -q -- "--- health_b16_$1_$i exit=0" <(tail -5 "$LOG") && return 0
    sleep 60
  done
  echo "tunnel unhealthy after $1; aborting" | tee -a "$LOG"; exit 1
}

diag() {
  step "diag_b16_$1" "$2" env CM3D_DIAG_ARM="$1" python -c "exec(open('scripts/diag_b16.py').read())"
}

health start
diag nofold 1800     # Pallas mask-stage compaction only
health n1

echo "QUEUE5 DONE $(date +%H:%M:%S)" | tee -a "$LOG"
grep -h '^{' "$LOG" > /root/repo/TPU_QUEUE_r03_bench_lines.jsonl 2>/dev/null || true
