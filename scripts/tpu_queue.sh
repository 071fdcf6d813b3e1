#!/bin/bash
# Serialized on-chip backlog (CLAUDE.md: never run two TPU jobs at once —
# concurrent full-scale compiles thrash past 900 s). Run from /root/repo:
#   bash scripts/tpu_queue.sh [logfile]
# Each step is separately time-bounded; a failure logs and continues.
set -u
cd /root/repo
LOG="${1:-/tmp/tpu_queue.log}"
: > "$LOG"

step() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name (timeout ${tmo}s) $(date +%H:%M:%S) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "--- $name exit=$? $(date +%H:%M:%S)" | tee -a "$LOG"
}

# 0. tiny health check first: do not start a 10-min compile on a sick tunnel
step health 240 python -c "
import jax, numpy as np, jax.numpy as jnp
print(jax.devices()); print(float(np.asarray(jnp.sum(jnp.ones((128,128))))))"
grep -q -- '--- health exit=0' "$LOG" || { echo 'tunnel unhealthy; aborting' | tee -a "$LOG"; exit 1; }

# 1. headline sanity (the driver contract)
step bench_lift 1200 python bench.py

# 2. entry compile check (driver contract)
step graft_entry 1200 python __graft_entry__.py

# 3. train-step bench (new --stage train)
step bench_train 1200 python bench.py --stage train

# 3b. fusion train-step bench (camera+LiDAR, new in round 3)
step bench_fusion_train 1800 python bench.py --stage fusion_train

# 4. compact-kernel tile sweep (lift stretch)
step tile_sweep 2400 python -c "exec(open('scripts/sweep_compact_tiles.py').read())"

# 4b. lift batch-size sweep (headline batch default check)
step lift_batch_sweep 2400 python -c "exec(open('scripts/sweep_lift_batch.py').read())"

# 5. SAM ring-encode chunk-batch A/B (mask-stage floor lever)
step ab_sam_batch 2400 python -c "exec(open('scripts/ab_sam_batch.py').read())"

# 5b. SAM size family A/B (--sam_size speed offer for the README)
step ab_sam_sizes 2400 python -c "exec(open('scripts/ab_sam_sizes.py').read())"

# 5c. SAM int8 w8a8 encode A/B (--quant_int8 speed offer: timing + deviation)
step ab_sam_int8 2400 python -c "exec(open('scripts/ab_sam_int8.py').read())"

# 5d. Detic int8 Swin-MLP A/B (the other half of --quant_int8)
step ab_detic_int8 2400 python -c "exec(open('scripts/ab_detic_int8.py').read())"

# 6. fused e2e bench (slowest: full-scale 2D compiles) — run last
step bench_e2e 3600 python bench.py --stage e2e

# 6b. fast-mode e2e (opt-in --rect_encode: the README's speed offer)
step bench_e2e_rect 3600 python bench.py --stage e2e --rect_encode

# 6c. int8 e2e (opt-in --quant_int8: the round-3 session-9 speed offer)
step bench_e2e_quant 3600 python bench.py --stage e2e --quant_int8

# 6d. combined fast mode: rect encode (-44% encoder FLOPs) + int8 Dense
step bench_e2e_rect_quant 3600 python bench.py --stage e2e --rect_encode --quant_int8

echo "QUEUE DONE $(date +%H:%M:%S)" | tee -a "$LOG"

# Persist the results where the next session / round-end commit can see
# them (/tmp does not survive the judge): full log + the bench JSON lines.
cp "$LOG" /root/repo/TPU_QUEUE_r03.log 2>/dev/null || true
grep -h '^{' "$LOG" > /root/repo/TPU_QUEUE_r03_bench_lines.jsonl 2>/dev/null || true
