"""Parallel execution: device meshes and the sharded keyframe pipeline."""

from cm3d_tpu.parallel.mesh import make_mesh, shard_batch
from cm3d_tpu.parallel.pipeline import (
    keyframe_step,
    make_keyframe_step_fn,
    sharded_keyframe_step,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "keyframe_step",
    "make_keyframe_step_fn",
    "sharded_keyframe_step",
]
