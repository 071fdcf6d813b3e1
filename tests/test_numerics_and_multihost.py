"""NaN hygiene of the device step (jax_debug_nans) + multi-host sharding."""

import numpy as np
import jax

from cm3d_tpu.parallel.multihost import shard_for_host


def test_shard_for_host_partitions_exactly():
    scenes = [f"s{i}" for i in range(10)]
    parts = [shard_for_host(scenes, pi, 3) for pi in range(3)]
    assert sorted(sum(parts, [])) == sorted(scenes)
    assert max(len(p) for p in parts) - min(len(p) for p in parts) <= 1
    # deterministic
    assert shard_for_host(scenes, 1, 3) == shard_for_host(scenes, 1, 3)


def test_lift_step_produces_no_nans_under_debug_nans():
    """SURVEY §5 sanitizer row: the whole device step runs clean under
    jax_debug_nans even with fully-empty masks and no valid lanes."""
    from cm3d_tpu.config import LiftStageConfig
    from cm3d_tpu.datasets.synthetic import SyntheticConfig, make_keyframe
    from cm3d_tpu.datasets.types import stack_keyframes
    from cm3d_tpu.parallel import make_keyframe_step_fn

    cfg = LiftStageConfig(
        max_points=2048, max_masks=16, max_points_per_mask=256,
        max_points_per_camera=1024, max_points_in_masks=512,
        max_lane_points=64,
    )
    syn = SyntheticConfig(num_cameras=2, image_w=128, image_h=96,
                          points_per_frame=1000, objects_per_frame=4)
    rng = np.random.default_rng(0)
    kf = make_keyframe(syn, cfg, rng)
    # adversarial: no valid masks at all, and no lanes
    kf_empty = kf._replace(
        mask_valid=np.zeros_like(kf.mask_valid),
        lane_valid=np.zeros_like(kf.lane_valid),
    )
    batch = stack_keyframes([kf, kf_empty])
    step = make_keyframe_step_fn(cfg)
    with jax.debug_nans(True):
        lift, boxes = jax.jit(step)(batch.frames)
        np.asarray(boxes.centers)  # force evaluation under the guard
    assert np.isfinite(np.asarray(boxes.centers)).all()
    assert not np.asarray(boxes.keep)[1].any()  # empty frame keeps nothing
