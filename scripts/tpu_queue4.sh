#!/bin/bash
# Session-11 on-chip queue: bisect the fusion_swin TPU worker crash
# (scripts/diag_swin.py arms, each in its own process — a worker crash
# kills the client), with health probes between arms since a crash can
# leave the tunnel briefly unhealthy. Known-crash confirm arm runs LAST.
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
  # retry up to ~6 min: the worker auto-restarts after a kernel fault
  for i in 1 2 3; do
    step "health_$1_$i" 240 python -c "
import jax, numpy as np, jax.numpy as jnp
print(jax.devices()); print(float(np.asarray(jnp.sum(jnp.ones((128,128))))))"
    grep -q -- "--- health_$1_$i exit=0" <(tail -5 "$LOG") && return 0
    sleep 60
  done
  echo "tunnel unhealthy after $1; aborting" | tee -a "$LOG"; exit 1
}

diag() {
  step "diag_swin_$1" "$2" env CM3D_DIAG_ARM="$1" python -c "exec(open('scripts/diag_swin.py').read())"
}

health start
diag trunk_fwd 1800
health t1
diag trunk_bwd 2400
health t2
diag fused_fwd 1800
health t3
diag fused_step 3000
health t4
diag step 3000          # known crash — confirm only, runs last
health end

echo "QUEUE4 DONE $(date +%H:%M:%S)" | tee -a "$LOG"
grep -h '^{' "$LOG" > /root/repo/TPU_QUEUE_r03_bench_lines.jsonl 2>/dev/null || true
