"""On-chip A/B: the r04 auto-chunked folded compaction vs the unfolded
path at batch 16/32 (the shapes that used to kill the TPU worker —
Mosaic fault frontier bisected in TPU_QUEUE_r03.log; fix =
compact_pallas._row_chunks 48-row launches).

Per batch size: run the lift step with the fold ON (auto-chunked) and
with _FOLD_CAMERA_UNION=False (top_k+gather stages), assert every
LiftOutputs field bit-exact, print ms/batch + kf/s for both.

Run from repo root: python -c "exec(open('scripts/ab_fold_chunk.py').read())"
CM3D_AB_SMOKE=1 runs tiny geometry on CPU with the Pallas path in
interpret mode and chunking FORCED (monkeypatched _row_chunks), so the
fold+chunk integration itself is exercised off-chip.
"""

import os
import time

smoke = os.environ.get("CM3D_AB_SMOKE") == "1"

import jax  # noqa: E402

if smoke:
    # the env var alone does not deregister the axon plugin (observed:
    # backend stays tpu); the config update before backend init does
    jax.config.update("jax_platforms", "cpu")

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import cm3d_tpu.kernels.compact_pallas as cp  # noqa: E402
import cm3d_tpu.ops.lift as lift  # noqa: E402
from cm3d_tpu.config import LiftStageConfig  # noqa: E402
from cm3d_tpu.datasets.synthetic import SyntheticConfig, make_keyframe  # noqa: E402
from cm3d_tpu.datasets.types import stack_keyframes  # noqa: E402
from cm3d_tpu.parallel import make_keyframe_step_fn  # noqa: E402

if smoke:
    lift_cfg = dataclasses.replace(
        LiftStageConfig(), max_points=2048, max_masks=16,
        max_points_per_mask=256, max_points_per_camera=1024,
        max_points_in_masks=512, max_lane_points=256,
    )
    syn = SyntheticConfig(
        num_cameras=2, image_w=128, image_h=96,
        points_per_frame=1500, objects_per_frame=6,
    )
    batches = (3,)
    lift._USE_PALLAS_COMPACT = "interpret"
    # force the chunked code path at tiny shapes (rows > 4 -> 4-row
    # launches); on chip the real frontier dispatch applies
    cp._row_chunks = lambda rows, s, interpret: 4 if rows > 4 else None
    n_iters = 1
else:
    lift_cfg = LiftStageConfig()
    syn = SyntheticConfig()
    batches = (16, 32)
    n_iters = 5

print(f"ab_fold_chunk smoke={smoke} backend={jax.default_backend()}",
      flush=True)

for bs in batches:
    rng = np.random.default_rng(0)
    frames = [make_keyframe(syn, lift_cfg, rng) for _ in range(bs)]
    batch = stack_keyframes(frames)
    dev = jax.device_put(batch.frames)

    outs = {}
    for mode in ("fold", "nofold"):
        lift._FOLD_CAMERA_UNION = None if mode == "fold" else False
        step = jax.jit(make_keyframe_step_fn(lift_cfg))
        out, _ = step(dev)
        # host transfer = the only reliable sync on the tunneled backend
        float(np.asarray(jnp.sum(out.centroids)))
        t0 = time.perf_counter()
        last = None
        for _ in range(n_iters):
            last = step(dev)
        float(np.asarray(jnp.sum(last[0].centroids)))
        dt = (time.perf_counter() - t0) / n_iters
        outs[mode] = jax.tree.map(np.asarray, out)
        print(f"batch {bs:3d} {mode:6s}: {dt * 1e3:8.2f} ms/batch "
              f"({bs / dt:7.1f} kf/s)", flush=True)

    a, b = outs["fold"], outs["nofold"]
    for name in type(a)._fields:
        np.testing.assert_array_equal(
            getattr(a, name), getattr(b, name), err_msg=name
        )
    print(f"batch {bs:3d}: BIT-EXACT fold(auto-chunked) vs nofold",
          flush=True)

lift._FOLD_CAMERA_UNION = None
print("ab_fold_chunk done", flush=True)
