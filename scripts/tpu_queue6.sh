#!/bin/bash
# Session-11 queue part 3: Swin-camera fused bf16 bench (the production
# training config) then the remaining b16 bisection arm (crash-risky,
# LAST).
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
    step "health_q6_$1_$i" 240 python -c "
import jax, numpy as np, jax.numpy as jnp
print(jax.devices()); print(float(np.asarray(jnp.sum(jnp.ones((128,128))))))"
    grep -q -- "--- health_q6_$1_$i exit=0" <(tail -5 "$LOG") && return 0
    sleep 60
  done
  echo "tunnel unhealthy after $1; aborting" | tee -a "$LOG"; exit 1
}

health start
step fusion_swin_fused_bf16 3000 python bench.py --stage fusion_train --swin_camera --camera_bf16
health f1
step diag_b16_nofold 1800 env CM3D_DIAG_ARM=nofold python -c "exec(open('scripts/diag_b16.py').read())"
health end

echo "QUEUE6 DONE $(date +%H:%M:%S)" | tee -a "$LOG"
grep -h '^{' "$LOG" > /root/repo/TPU_QUEUE_r03_bench_lines.jsonl 2>/dev/null || true
