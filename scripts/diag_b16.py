"""Batch-16 lift-crash bisection arms (run via `python scripts/../diag` style
exec from repo root: `python -c "exec(open('scripts/diag_b16.py').read())"`).

Session-10 finding: bench_lift(batch_size=16) kills the TPU worker
("kernel fault") on the default Pallas path; batch 4/8 are fine. Arms,
selected by CM3D_DIAG_ARM:

  pallas      — default path (crashed in r03; since the r04 row-grid
                auto-chunking — compact_pallas._row_chunks — this arm
                runs 48-row launches and should PASS; see
                scripts/ab_fold_chunk.py for the bit-exact A/B)
  xla_compact — _USE_PALLAS_COMPACT=False (compaction via topk+gather;
                Pallas medoid still on)
  nofold      — Pallas mask-stage compaction only (_FOLD_CAMERA_UNION=False)
  xla_medoid  — Pallas compaction on, medoid forced to the XLA fallback
  all_xla     — compaction AND medoid off Pallas

CM3D_AB_SMOKE=1 validates the monkeypatch targets and plumbing on CPU
without running the production-scale bench.
"""

import os

arm = os.environ.get("CM3D_DIAG_ARM", "pallas")
smoke = os.environ.get("CM3D_AB_SMOKE") == "1"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if smoke:
    # the env var alone does not deregister the axon plugin (observed:
    # backend stays tpu); the config update before backend init does
    jax.config.update("jax_platforms", "cpu")

import cm3d_tpu.ops.lift as lift  # noqa: E402
import cm3d_tpu.ops.medoid as medoid  # noqa: E402

if arm == "xla_compact":
    lift._USE_PALLAS_COMPACT = False
elif arm == "nofold":
    lift._FOLD_CAMERA_UNION = False
elif arm in ("xla_medoid", "all_xla"):
    if arm == "all_xla":
        lift._USE_PALLAS_COMPACT = False
    # medoid has no flag: force the XLA fallback in place.
    medoid.masked_medoid = lambda p, v: medoid._masked_medoid_xla(p, v)
    medoid.masked_medoid_rows = lambda r, v: medoid._masked_medoid_xla(
        jnp.moveaxis(r, 1, -1), v
    )
    # lift binds masked_medoid_rows at import time — repoint it too.
    lift.masked_medoid_rows = medoid.masked_medoid_rows
elif arm != "pallas":
    raise SystemExit(f"unknown CM3D_DIAG_ARM={arm}")

print(f"diag_b16 arm={arm} smoke={smoke} backend={jax.default_backend()}")

if smoke:
    # plumbing check only: tiny geometry through the same entry point
    import numpy as np

    from cm3d_tpu import benchmarks

    assert hasattr(benchmarks, "bench_lift")
    m = medoid.masked_medoid_rows(
        jnp.zeros((2, 3, 8)), jnp.ones((2, 8), bool)
    )
    assert np.asarray(m).shape == (2,)
    print("smoke ok")
else:
    from cm3d_tpu import benchmarks

    print(benchmarks.bench_lift(batch_size=16))
