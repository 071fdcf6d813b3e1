#!/bin/bash
# Follow-up on-chip queue (session 10): fusion-step A/B after the
# scatter-free splat backward, its phase profile, and the batch-16 lift
# crash bisection (pallas vs XLA path — run LAST: a worker crash can
# leave the tunnel unhealthy for later steps).
set -u
cd /root/repo
LOG=/root/repo/TPU_QUEUE_r03.log

step() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name (timeout ${tmo}s) $(date +%H:%M:%S) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "--- $name exit=$? $(date +%H:%M:%S)" | tee -a "$LOG"
}

step health2 240 python -c "
import jax, numpy as np, jax.numpy as jnp
print(jax.devices()); print(float(np.asarray(jnp.sum(jnp.ones((128,128))))))"
grep -q -- '--- health2 exit=0' <(tail -5 "$LOG") || { echo 'tunnel unhealthy; aborting' | tee -a "$LOG"; exit 1; }

# clean re-run: the 03:37 bench_e2e (2072 ms/kf) ran while the CPU test
# suite starved the pipeline's host threads (single-core VM — never run
# CPU-heavy jobs alongside TPU benches)
step bench_e2e_clean 3600 python bench.py --stage e2e

# A/B vs the 267.78 ms recorded this round before the custom-VJP fix
step bench_fusion_train2 1800 python bench.py --stage fusion_train

step profile_fusion 2400 python -c "exec(open('scripts/profile_fusion.py').read())"

# batch-16 lift crash bisection (kernel fault vs memory/tunnel)
step diag_b16_pallas 1800 python -c "
from cm3d_tpu import benchmarks
print(benchmarks.bench_lift(batch_size=16))"
step diag_b16_xla 1800 python -c "
import cm3d_tpu.ops.lift as lift
lift._USE_PALLAS_COMPACT = False
from cm3d_tpu import benchmarks
print(benchmarks.bench_lift(batch_size=16))"

echo "QUEUE2 DONE $(date +%H:%M:%S)" | tee -a "$LOG"
grep -h '^{' "$LOG" > /root/repo/TPU_QUEUE_r03_bench_lines.jsonl 2>/dev/null || true
