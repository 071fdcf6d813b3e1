"""The per-keyframe device step and its sharded batch version.

`keyframe_step` = lift + lane yaw + pushback + circle NMS for ONE keyframe —
the fusion of the reference's pass 1 (src/nuscenes/2d_to_3d.py:415-695),
lane assignment (:699-706) and pass 2 (:733-825) plus per-sample NMS
(:844-907). Because each centroid's nearest-lane lookup is independent, the
reference's scene-level barrier dissolves: the whole step is per-keyframe
and shards freely over the `data` mesh axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cm3d_tpu.config import LiftStageConfig, class_arrays, drivable_class_array
from cm3d_tpu.datasets.types import Keyframe
from cm3d_tpu.ops.lift import (
    BoxOutputs,
    BoxParams,
    LiftOutputs,
    LiftParams,
    build_boxes,
    lift_keyframe,
)


def keyframe_step(
    frame: Keyframe,
    priors: jax.Array,
    is_vehicle: jax.Array,
    nms_radius_sq: jax.Array,
    lift_params: LiftParams,
    drivable_class: jax.Array | None = None,
    box_params: BoxParams = BoxParams(),
) -> tuple[LiftOutputs, BoxOutputs]:
    """Process one keyframe end to end on device."""
    lift = lift_keyframe(
        frame.points,
        frame.point_valid,
        frame.cameras.ego_translation,
        frame.cameras.ego_rotation,
        frame.cameras.cam_translation,
        frame.cameras.cam_rotation,
        frame.cameras.intrinsics,
        frame.mask_bits,
        frame.mask_cam,
        frame.mask_valid,
        lift_params,
    )
    boxes = build_boxes(
        lift.centroids,
        lift.has_points,
        frame.mask_label,
        frame.mask_score,
        frame.lane_points,
        frame.lane_valid,
        frame.ego_translation,
        priors,
        is_vehicle,
        nms_radius_sq,
        drivable_class=drivable_class,
        drivable_grid=frame.drivable_grid,
        drivable_origin=frame.drivable_origin,
        params=box_params,
    )
    return lift, boxes


def make_keyframe_step_fn(cfg: LiftStageConfig = LiftStageConfig()):
    """Build a jittable batched step: KeyframeBatch.frames -> (LiftOutputs, BoxOutputs),
    vmapped over the leading batch dim."""
    priors_np, is_vehicle_np, radii_np = class_arrays(
        use_chatgpt_priors=cfg.use_chatgpt_priors, priors_file=cfg.priors_file
    )
    drivable_np = drivable_class_array()
    lift_params = LiftParams(
        min_dist=cfg.min_dist,
        max_points_per_mask=cfg.max_points_per_mask,
        max_points_per_camera=cfg.max_points_per_camera,
        max_points_in_masks=cfg.max_points_in_masks,
        erode=cfg.erode_masks,
    )
    box_params = BoxParams(
        lane_dist_filter=cfg.lane_dist_filter,
        object_lane_thresh=cfg.object_lane_thresh,
        vehicle_lane_thresh=cfg.vehicle_lane_thresh,
        drivable_filter=cfg.drivable_filter,
        drivable_resolution=cfg.drivable_resolution,
    )

    def step(frames: Keyframe):
        priors = jnp.asarray(priors_np)
        is_vehicle = jnp.asarray(is_vehicle_np)
        radii = jnp.asarray(radii_np)
        drivable = jnp.asarray(drivable_np)
        return jax.vmap(
            lambda f: keyframe_step(
                f, priors, is_vehicle, radii, lift_params, drivable, box_params
            )
        )(frames)

    return step


def sharded_batch_step(mesh, step):
    """Jit any batch-major step over a mesh: every input leaf's LEADING
    dim is constrained onto `data` (pure DP — params-free steps whose
    inputs are all [B, ...] pytrees: the nuScenes/Waymo keyframe step and
    the KITTI step). XLA inserts no collectives; the scaling story is
    keyframes over ICI."""
    from jax.sharding import NamedSharding

    from cm3d_tpu.parallel.mesh import batch_spec

    @jax.jit
    def run(*args):
        args = jax.lax.with_sharding_constraint(
            args,
            jax.tree.map(lambda x: NamedSharding(mesh, batch_spec(x)), args),
        )
        return step(*args)

    return run


def sharded_keyframe_step(mesh, cfg: LiftStageConfig = LiftStageConfig()):
    """Jit the batched lift step over a mesh: batch dim sharded on `data`,
    class tables replicated (see sharded_batch_step)."""
    return sharded_batch_step(mesh, make_keyframe_step_fn(cfg))


def dp_step(step, batch_size: int, data_parallel: int):
    """The lift CLIs' --data_parallel contract: jit `step` plain when
    data_parallel is 0, else DP-shard its batch-major inputs over a fresh
    N-chip data mesh (validation in mesh.dp_mesh)."""
    if not data_parallel:
        return jax.jit(step)
    from cm3d_tpu.parallel.mesh import dp_mesh

    return sharded_batch_step(dp_mesh(data_parallel, batch_size), step)
