"""Batched keyframe step + multi-device sharding tests (8 virtual CPU devs)."""

import numpy as np
import jax
import jax.numpy as jnp

from cm3d_tpu.config import LiftStageConfig
from cm3d_tpu.datasets.synthetic import SyntheticConfig, make_keyframe
from cm3d_tpu.datasets.types import stack_keyframes
from cm3d_tpu.parallel import make_mesh, make_keyframe_step_fn, shard_batch, sharded_keyframe_step

SMALL = LiftStageConfig(
    max_points=2048, max_masks=16, max_points_per_mask=256, max_lane_points=512
)
SYN = SyntheticConfig(
    num_cameras=2, image_w=128, image_h=96, points_per_frame=1500, objects_per_frame=6
)


def make_batch(n):
    rng = np.random.default_rng(0)
    frames = [make_keyframe(SYN, SMALL, rng) for _ in range(n)]
    return stack_keyframes(frames)


def test_batched_step_runs_and_is_consistent():
    batch = make_batch(2)
    step = jax.jit(make_keyframe_step_fn(SMALL))
    lift, boxes = step(batch.frames)
    assert lift.centroids.shape == (2, SMALL.max_masks, 3)
    assert boxes.keep.shape == (2, SMALL.max_masks)
    # kept boxes must be valid masks with points
    keep = np.asarray(boxes.keep)
    has = np.asarray(lift.has_points)
    assert (keep <= has).all()
    # some objects must survive
    assert keep.sum() > 0


def test_sharded_step_matches_single_device():
    n_dev = jax.device_count()
    assert n_dev == 8, f"expected 8 virtual devices, got {n_dev}"
    batch = make_batch(8)

    step = jax.jit(make_keyframe_step_fn(SMALL))
    ref_lift, ref_boxes = step(batch.frames)

    mesh = make_mesh()
    run = sharded_keyframe_step(mesh, SMALL)
    sharded = shard_batch(batch.frames, mesh)
    lift, boxes = run(sharded)

    np.testing.assert_allclose(
        np.asarray(lift.centroids), np.asarray(ref_lift.centroids), atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(boxes.keep), np.asarray(ref_boxes.keep))
    np.testing.assert_allclose(
        np.asarray(boxes.centers), np.asarray(ref_boxes.centers), atol=1e-4
    )
