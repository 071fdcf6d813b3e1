"""On-chip sweep: lift-stage throughput vs batch size.

The headline (bench.py) measures batch 8. Larger batches amortize the
fixed per-dispatch overheads and may tile the compaction/medoid kernels'
row grids better; smaller batches bound latency. This prints kf/s for
batch 4/8/16/32 so the default can be flipped on evidence (bench.py's
batch stays 8 unless a bigger batch wins by a solid margin AND fits HBM).

Run: python -c "exec(open('scripts/sweep_lift_batch.py').read())"
CM3D_AB_SMOKE=1 runs a tiny-geometry smoke of the sweep loop itself,
FORCING the CPU backend first (the image's sitecustomize pre-selects
axon; config must flip back before the first backend init or the smoke
hangs on a dead tunnel).
"""

import os

SMOKE = bool(os.environ.get("CM3D_AB_SMOKE"))

if SMOKE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

if SMOKE:
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cm3d_tpu.config import LiftStageConfig
    from cm3d_tpu.datasets.synthetic import SyntheticConfig, make_keyframe
    from cm3d_tpu.datasets.types import stack_keyframes
    from cm3d_tpu.parallel import make_keyframe_step_fn

    # bench_lift hardcodes production LiftStageConfig(), so the smoke
    # drives the same step/stack/sync loop directly at tiny geometry
    tiny_lift = dataclasses.replace(
        LiftStageConfig(), max_points=2048, max_masks=16,
        max_points_per_mask=256, max_points_per_camera=1024,
        max_points_in_masks=512, max_lane_points=256,
    )
    tiny_syn = SyntheticConfig(
        num_cameras=2, image_w=128, image_h=96,
        points_per_frame=1500, objects_per_frame=6,
    )
    for bs in (2, 4):
        rng = np.random.default_rng(0)
        frames = [make_keyframe(tiny_syn, tiny_lift, rng) for _ in range(bs)]
        batch = stack_keyframes(frames)
        step = jax.jit(make_keyframe_step_fn(tiny_lift))
        out, _ = step(jax.device_put(batch.frames))
        s = float(np.asarray(jnp.sum(out.centroids)))
        print(f"batch {bs:3d}: smoke ok (sum {s:.3f})", flush=True)
else:
    from cm3d_tpu import benchmarks

    # batch 16/32 run the folded path through compact_pallas's r04
    # row-grid auto-chunking (48-row launches below the bisected Mosaic
    # fault frontier — TPU_QUEUE_r03.log; see ops/lift.py
    # _FOLD_CAMERA_UNION). Keep them LAST so a regression can't poison
    # the in-envelope points.
    for bs in (4, 8, 16, 32):
        try:
            r = benchmarks.bench_lift(batch_size=bs)
            print(f"batch {bs:3d}: {r['value']:8.2f} kf/s "
                  f"(vs_baseline {r['vs_baseline']})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"batch {bs:3d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
