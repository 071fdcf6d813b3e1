"""Probe the UNTESTED row counts between the validated 48-row fold
envelope and the 96-row worker-kill frontier (VERDICT r05 item 5).

r04's _row_chunks chunked any >48-row launch at >=32768 padded sources
down to 48 rows because only 48 (pass, bit-exact) and 96 (worker fault)
had been probed. r05 probed 64/80 (pass) and raised the envelope; the
balanced chunker can emit ANY size <= 80, so the default probe grid now
covers the whole envelope at 8-row resolution (review r05 finding: the
interior was otherwise assumed monotonic, which this fault family is
not — cf. the gdino bf16 envelope shift).

Each shape runs in its OWN subprocess (a worker fault kills the client);
the child bypasses the auto-chunk by raising _SAFE_ROWS to the probed
row count and checks bit-exactness against a plain-XLA compaction oracle.

Run (orchestrator): python -c "exec(open('scripts/probe_fold_envelope.py').read())"
CM3D_AB_SMOKE=1: tiny interpret-mode CPU plumbing check.
Child mode (internal): CM3D_PROBE_ROWS=<rows> runs one shape.
"""

import json
import os
import subprocess
import sys
import time

SMOKE = os.environ.get("CM3D_AB_SMOKE") == "1"
CHILD_ROWS = os.environ.get("CM3D_PROBE_ROWS")

S = 512 if SMOKE else 32768   # padded sources (>= the fault frontier)
LIMIT = 128 if SMOKE else 2048
D = 5                         # camera-fold value depth (xyz+flat+id)


def child(rows: int) -> None:
    import jax

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from cm3d_tpu.kernels import compact_pallas as cp

    # single launch at the probed row count (bypass the auto-chunk)
    cp._SAFE_ROWS = max(cp._SAFE_ROWS, rows)

    rng = np.random.default_rng(rows)
    sel = rng.random((rows, S)) < 0.05
    vals = rng.normal(size=(rows, D, S)).astype(np.float32)

    out = jax.jit(
        lambda s, v: cp.compact_rows_pallas(s, v, LIMIT, interpret=SMOKE)
    )(jnp.asarray(sel), jnp.asarray(vals))
    got = np.asarray(out)  # a worker fault dies HERE

    # plain-numpy oracle: ascending selected positions, zero-padded
    want = np.zeros((rows, D, LIMIT), np.float32)
    for r in range(rows):
        idx = np.nonzero(sel[r])[0][:LIMIT]
        want[r, :, : len(idx)] = vals[r][:, idx]
    exact = np.array_equal(got, want)
    print(f"rows={rows} S={S} bit_exact={exact}", flush=True)
    sys.exit(0 if exact else 2)


def main() -> int:
    # default = the full 8-row grid over the <=80 envelope (balanced
    # chunking emits arbitrary interior sizes, so the whole range must be
    # grid-validated, not just the landmark sizes); CM3D_PROBE_GRID
    # overrides (e.g. "48,64,80" for the quick landmark check, or "96"
    # to re-confirm the kill frontier on a new jax)
    grid = os.environ.get("CM3D_PROBE_GRID", "8,16,24,32,40,48,56,64,72,80")
    rows_list = [int(r) for r in grid.split(",")]
    results = []
    for rows in rows_list:
        env = dict(os.environ, CM3D_PROBE_ROWS=str(rows))
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, "-c",
                 "exec(open('scripts/probe_fold_envelope.py').read())"],
                env=env, timeout=120 if SMOKE else 1200,
                capture_output=True, text=True,
            )
            status = {0: "pass", 2: "mismatch"}.get(proc.returncode, "fault")
            tail = (proc.stdout + proc.stderr).strip().splitlines()[-2:]
        except subprocess.TimeoutExpired:
            status, tail = "timeout", []
        results.append({"rows": rows, "status": status,
                        "seconds": round(time.time() - t0, 1),
                        "tail": tail})
        print(f"rows={rows}: {status} ({results[-1]['seconds']}s)",
              flush=True)
    line = json.dumps({"fold_envelope_probe": results, "S": S,
                       "limit": LIMIT, "D": D})
    print(line, flush=True)
    if not SMOKE:
        with open("TPU_QUEUE_r05.log", "a") as f:
            f.write(f"probe_fold_envelope {time.strftime('%F %T')}: "
                    f"{line}\n")
    return 0


if CHILD_ROWS is not None:
    child(int(CHILD_ROWS))
else:
    sys.exit(main())
