"""One-command re-validation of the XLA:TPU codegen fault fences
(VERDICT r05 item 6).

Three scale-dependent worker faults are FENCED (not fixed) in this repo,
and the fences assume bisected frontiers that may MOVE on a jax/libtpu
upgrade:

  fold    — compact_pallas row-grid folding faults at >=96 rows x
            >=32768 padded sources; fence = _row_chunks balanced
            launches within the probe-validated <=80-row envelope
            (kernels/compact_pallas.py; grid-probed by
            scripts/probe_fold_envelope.py).
  gdino   — fused-Swin GroundingDino dispatch faults at B>=6 f32 /
            B>=3 bf16 at 800x1216; fence = make_gdino_detector
            max_batch=3 chunked dispatch, bf16 forces unfused
            (models/gdino.py).
  swin    — the UNFUSED Swin-T camera fusion train step faults at full
            graph scale; fence = camera_fused=True default
            (train/bevfusion.py).

Each probe runs one existing diag arm IN ITS OWN SUBPROCESS (a worker
kill poisons the client process) and classifies PASS / FAULT; the table
compares against the bisected expectation. Run this after ANY jax or
libtpu upgrade; a safe-side probe flipping to FAULT means a fence must
widen, a fault-side probe flipping to PASS means a fence (and its perf
cost — batch 16/32 lift, gdino batching) can be retired.

Usage:
  python -c "exec(open('scripts/regression_probes.py').read())"
  CM3D_PROBES=safe      only the safe-side probes (fences sufficient?)
  CM3D_PROBES=fault     only the fault-side probes (fences still needed?)
  CM3D_AB_SMOKE=1       plumbing check on CPU (every arm tiny, all PASS
                        expected -> fault-side rows report MOVED)

Full run is compile-heavy (~30-60 min on a fresh axon process per the
compile-cache notes in CLAUDE.md). Results append to TPU_QUEUE_r05.log.
"""

import json
import os
import subprocess
import sys
import time

SMOKE = os.environ.get("CM3D_AB_SMOKE") == "1"
WHICH = os.environ.get("CM3D_PROBES", "all")

# (name, script, env, expected, side[, timeout_s])
#   expected: "pass" (fence-sufficient side) | "fault" (fence-needed side)
PROBES = [
    # fold fence: chunked Pallas fold path at the batch that used to kill
    # the worker pre-chunking (TPU_QUEUE_r04.log: b16 pallas bit-exact)
    ("fold_b16_chunked_pallas", "scripts/diag_b16.py",
     {"CM3D_DIAG_ARM": "pallas"}, "pass", "safe"),
    # gdino fence: f32 chunk<=3 passes, f32 B=6 fused faults, bf16 fused
    # B=3 faults (TPU_QUEUE_r04.log 13:07-17:46)
    ("gdino_f32_B3_fused", "scripts/diag_gdino.py",
     {"CM3D_DIAG_ARM": "full_fused", "CM3D_DIAG_B": "3"}, "pass", "safe"),
    ("gdino_f32_B6_fused", "scripts/diag_gdino.py",
     {"CM3D_DIAG_ARM": "full_fused", "CM3D_DIAG_B": "6"}, "fault", "fault"),
    ("gdino_bf16_B3_fused", "scripts/diag_gdino.py",
     {"CM3D_DIAG_ARM": "full_fused", "CM3D_DIAG_B": "3",
      "CM3D_DIAG_DTYPE": "bfloat16"}, "fault", "fault"),
    # swin fence: fused full step passes (132.98 ms/batch-8, r03 s11),
    # unfused full step kills the worker
    ("swin_fused_step", "scripts/diag_swin.py",
     {"CM3D_DIAG_ARM": "fused_step"}, "pass", "safe"),
    # NB: this fault takes LONG to manifest — in the r05 run it appeared
    # only after ~50 min (full-scale unfused compile first); 1800 s
    # timed out short of it, so it gets a 2x budget
    ("swin_unfused_step", "scripts/diag_swin.py",
     {"CM3D_DIAG_ARM": "step"}, "fault", "fault", 3600),
]


def run_probe(name, script, env, timeout_s):
    full_env = dict(os.environ)
    full_env.update(env)
    if SMOKE:
        full_env["CM3D_AB_SMOKE"] = "1"
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, "-c", f"exec(open({script!r}).read())"],
            env=full_env, cwd=os.getcwd(), timeout=timeout_s,
            capture_output=True, text=True,
        )
        status = "pass" if proc.returncode == 0 else "fault"
        tail = (proc.stdout + proc.stderr).strip().splitlines()[-3:]
    except subprocess.TimeoutExpired:
        # a hung worker (no fault, no completion) is its own signal
        status, tail = "timeout", []
    return {"name": name, "status": status,
            "seconds": round(time.time() - t0, 1), "tail": tail}


def main():
    rows = []
    ok = True
    for name, script, env, expected, side, *rest in PROBES:
        if WHICH == "safe" and side != "safe":
            continue
        if WHICH == "fault" and side != "fault":
            continue
        budget = rest[0] if rest else 1800
        r = run_probe(name, script, env, 120 if SMOKE else budget)
        r["expected"] = expected
        if SMOKE and expected == "fault":
            # tiny CPU shapes never fault — only plumbing is validated
            r["verdict"] = "SMOKE(skip-expectation)"
        elif r["status"] == expected:
            r["verdict"] = "AS-BISECTED"
        else:
            r["verdict"] = "MOVED"
            ok = False
        rows.append(r)
        print(f"[{r['verdict']:>22}] {name}: {r['status']} "
              f"(expected {expected}, {r['seconds']}s)", flush=True)
        if r["verdict"] == "MOVED" and r["tail"]:
            for line in r["tail"]:
                print("    |", line, flush=True)

    line = json.dumps({"probe_table": rows, "all_as_bisected": ok})
    print(line, flush=True)
    if not SMOKE:
        with open("TPU_QUEUE_r05.log", "a") as f:
            f.write(f"regression_probes {time.strftime('%F %T')}: "
                    f"{line}\n")
    return 0 if ok else 1


sys.exit(main())
