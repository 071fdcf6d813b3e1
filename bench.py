"""Headline benchmark: end-to-end pseudo-label lift throughput per chip.

Measures the fused per-keyframe device step (lift -> lane yaw -> pushback ->
circle NMS; reference: the entire src/nuscenes/2d_to_3d.py main loop) at
realistic nuScenes scale — 131072 aggregated sweep points, 128 masks at
1024x576, 6 cameras — on whatever accelerator jax finds (one TPU chip under
the driver). Prints ONE JSON line.

Baseline: BASELINE.json target of 50 keyframes/sec/chip (the reference
publishes no throughput numbers; its per-mask Python loops are far below
this).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main_masks() -> None:
    """2D mask stage (Detic+SAM) throughput at production geometry with
    random full-size weights — `python bench.py --stage masks`. Prints one
    JSON line. Measured numbers for this round: MASK_BENCH_r02.json."""
    import os

    os.environ["MASK_BENCH_E2E"] = "1"
    import io
    import contextlib
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        exec(open("scripts/bench_masks.py").read(), {"__name__": "bench"})
    m = re.search(r"run_mask_stage.*?= ([0-9.]+) kf/s", buf.getvalue())
    kf = float(m.group(1)) if m else 0.0
    print(json.dumps({
        "metric": "mask_stage_keyframes_per_sec_per_chip",
        "value": kf,
        "unit": "keyframes/sec",
        "vs_baseline": None,
    }))


def main() -> None:
    import jax

    from cm3d_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    from cm3d_tpu.config import LiftStageConfig
    from cm3d_tpu.datasets.synthetic import SyntheticConfig, make_keyframe
    from cm3d_tpu.datasets.types import stack_keyframes
    from cm3d_tpu.parallel import make_keyframe_step_fn

    lift_cfg = LiftStageConfig()
    syn = SyntheticConfig()
    rng = np.random.default_rng(0)

    batch_size = 8
    frames = [make_keyframe(syn, lift_cfg, rng) for _ in range(batch_size)]
    batch = stack_keyframes(frames)
    device_frames = jax.device_put(batch.frames)

    step = jax.jit(make_keyframe_step_fn(lift_cfg))

    def sync(out):
        # A real host transfer: on tunneled backends block_until_ready can
        # return before execution finishes; reading a value cannot.
        lift, boxes = out
        return float(np.asarray(jnp.sum(lift.centroids)))

    import jax.numpy as jnp

    # warmup / compile
    sync(step(device_frames))

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = step(device_frames)
    sync(out)  # device stream is serial: syncing the last syncs all
    dt = time.perf_counter() - t0

    kf_per_sec = n_iters * batch_size / dt
    target = 50.0  # BASELINE.json: >=50 keyframes/sec/chip on v5e
    print(
        json.dumps(
            {
                "metric": "lift_keyframes_per_sec_per_chip",
                "value": round(kf_per_sec, 2),
                "unit": "keyframes/sec",
                "vs_baseline": round(kf_per_sec / target, 3),
            }
        )
    )


if __name__ == "__main__":
    import sys

    if "--stage" in sys.argv and "masks" in sys.argv:
        main_masks()
    else:
        main()
