"""Driver benchmark entry point. Prints one JSON line per metric; the
FIRST line is the headline the driver records.

Default run:
  line 1 — lift-stage throughput (the fused 3D lift step; reference:
           the src/nuscenes/2d_to_3d.py main loop). This is NOT the
           end-to-end number: the full pipeline is 2D-mask-stage-bound.
  line 2 — fused end-to-end images->masks->boxes throughput through
           pipelines.e2e.run_fused (production geometry, random
           full-size weights; see cm3d_tpu/benchmarks.py for the exact
           protocol and its content-swap caveat).

Modes: --stage lift | masks | e2e (single metric each).
"""

from __future__ import annotations

import json
import sys


def _emit(d: dict) -> None:
    print(json.dumps(d), flush=True)


def main() -> None:
    from cm3d_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    from cm3d_tpu import benchmarks

    stage = None
    if "--stage" in sys.argv:
        stage = sys.argv[sys.argv.index("--stage") + 1]

    if stage == "masks":
        _emit(benchmarks.bench_mask_stage())
        return
    if stage == "e2e":
        _emit(benchmarks.bench_e2e())
        return
    if stage == "lift":
        _emit(benchmarks.bench_lift())
        return

    # default: headline lift line first (flushed), then the e2e line —
    # a failure or timeout in the (much slower to compile) e2e bench must
    # never cost the headline metric.
    _emit(benchmarks.bench_lift())
    try:
        _emit(benchmarks.bench_e2e())
    except Exception as e:  # noqa: BLE001 - report, don't fail the bench
        _emit({
            "metric": "e2e_keyframes_per_sec_per_chip",
            "value": 0.0,
            "unit": "keyframes/sec",
            "vs_baseline": None,
            "error": f"{type(e).__name__}: {e}",
        })


if __name__ == "__main__":
    main()
