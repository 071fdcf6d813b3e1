#!/bin/bash
# Third on-chip queue (session 10): fusion-step numbers for the new
# camera-backbone knobs (README evidence for --camera_backbone swin_t /
# --camera_bf16).
set -u
cd /root/repo
LOG=/root/repo/TPU_QUEUE_r03.log

step() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name (timeout ${tmo}s) $(date +%H:%M:%S) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "--- $name exit=$? $(date +%H:%M:%S)" | tee -a "$LOG"
}

step health3 240 python -c "
import jax, numpy as np, jax.numpy as jnp
print(jax.devices()); print(float(np.asarray(jnp.sum(jnp.ones((128,128))))))"
grep -q -- '--- health3 exit=0' <(tail -5 "$LOG") || { echo 'tunnel unhealthy; aborting' | tee -a "$LOG"; exit 1; }

# after the row-gather segment-sum backward fix: A/B vs 225.69 (04:25)
step fusion_conv_rowbwd 1800 python bench.py --stage fusion_train
step profile_fusion2 2400 python -c "exec(open('scripts/profile_fusion.py').read())"

step fusion_conv_bf16 1800 python bench.py --stage fusion_train --camera_bf16
step fusion_swin 3000 python bench.py --stage fusion_train --swin_camera
step fusion_swin_bf16 3000 python bench.py --stage fusion_train --swin_camera --camera_bf16

echo "QUEUE3 DONE $(date +%H:%M:%S)" | tee -a "$LOG"
grep -h '^{' "$LOG" > /root/repo/TPU_QUEUE_r03_bench_lines.jsonl 2>/dev/null || true

# re-run the lost bisection arm (session-10 queue2 died mid-step):
# batch-16 lift on the XLA compaction path — crash-risky, keep LAST
step diag_b16_xla 1800 python -c "
import cm3d_tpu.ops.lift as lift
lift._USE_PALLAS_COMPACT = False
from cm3d_tpu import benchmarks
print(benchmarks.bench_lift(batch_size=16))"

echo "QUEUE3+DIAG DONE $(date +%H:%M:%S)" | tee -a "$LOG"
grep -h '^{' "$LOG" > /root/repo/TPU_QUEUE_r03_bench_lines.jsonl 2>/dev/null || true
