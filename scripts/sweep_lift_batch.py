"""On-chip sweep: lift-stage throughput vs batch size.

The headline (bench.py) measures batch 8. Larger batches amortize the
fixed per-dispatch overheads and may tile the compaction/medoid kernels'
row grids better; smaller batches bound latency. This prints kf/s for
batch 4/8/16/32 so the default can be flipped on evidence (bench.py's
batch stays 8 unless a bigger batch wins by a solid margin AND fits HBM).

Run: python -c "exec(open('scripts/sweep_lift_batch.py').read())"
CM3D_AB_SMOKE=1 runs a tiny-config CPU smoke of the script itself.
"""

import os

from cm3d_tpu import benchmarks

SMOKE = bool(os.environ.get("CM3D_AB_SMOKE"))

if SMOKE:
    # tiny geometry: patch the production configs the bench builds from
    import dataclasses

    import numpy as np

    from cm3d_tpu.config import LiftStageConfig
    from cm3d_tpu.datasets.synthetic import SyntheticConfig

    import cm3d_tpu.benchmarks as _b

    _orig_lift_cfg = LiftStageConfig
    _tiny_lift = dataclasses.replace(
        LiftStageConfig(), max_points=2048, max_masks=16,
        max_points_per_mask=256, max_points_per_camera=1024,
        max_points_in_masks=512, max_lane_points=256,
    )
    _tiny_syn = SyntheticConfig(
        num_cameras=2, image_w=128, image_h=96,
        points_per_frame=1500, objects_per_frame=6,
    )

    import cm3d_tpu.config as _cfgmod
    import cm3d_tpu.datasets.synthetic as _synmod

    _cfgmod_LiftStageConfig = _cfgmod.LiftStageConfig
    _b_batches = (2, 4)
else:
    _b_batches = (4, 8, 16, 32)

for bs in _b_batches:
    try:
        if SMOKE:
            # call the underlying pieces at tiny scale (the production
            # bench_lift hardcodes LiftStageConfig()): just validate the
            # sweep loop + sync pattern compile and run
            import jax
            import jax.numpy as jnp
            import numpy as np

            from cm3d_tpu.datasets.types import stack_keyframes
            from cm3d_tpu.parallel import make_keyframe_step_fn
            from cm3d_tpu.datasets.synthetic import make_keyframe

            rng = np.random.default_rng(0)
            frames = [make_keyframe(_tiny_syn, _tiny_lift, rng)
                      for _ in range(bs)]
            batch = stack_keyframes(frames)
            step = jax.jit(make_keyframe_step_fn(_tiny_lift))
            out, _ = step(jax.device_put(batch.frames))
            s = float(np.asarray(jnp.sum(out.centroids)))
            print(f"batch {bs:3d}: smoke ok (sum {s:.3f})", flush=True)
        else:
            r = benchmarks.bench_lift(batch_size=bs)
            print(f"batch {bs:3d}: {r['value']:8.2f} kf/s "
                  f"(vs_baseline {r['vs_baseline']})", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"batch {bs:3d}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
