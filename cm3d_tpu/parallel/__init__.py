"""Parallel execution: device meshes, the sharded keyframe pipeline, and
pipeline parallelism (gpipe)."""

from cm3d_tpu.parallel.gpipe import (
    make_pipeline_fn,
    stack_layer_params,
    stage_mesh,
)
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
    "make_pipeline_fn",
    "stack_layer_params",
    "stage_mesh",
]
