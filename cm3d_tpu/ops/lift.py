"""Fused 2D->3D lifting: erode -> project -> frustum cull -> in-mask gather
-> compaction -> medoid, plus box building (lane yaw, pushback, circle NMS).

This one jittable function replaces the reference's per-mask Python loop
(src/nuscenes/2d_to_3d.py:510-665) — which re-transforms the FULL aggregated
point cloud once per mask — with:
  * one projection per camera (masks of the same camera share it),
  * a batched [M, N] in-mask gather,
  * scatter-compaction of selected point indices into fixed [M, K] buffers,
  * a batched chunked medoid.

Everything is fixed-shape: points, masks and boxes are padded with validity
masks, so the whole keyframe step compiles once and `vmap`s/shards over a
keyframe batch.

Reference semantics notes (deliberate quirk reproduction — see SURVEY.md §7):
- Frustum test: depths > min_dist (NOT sqrt(min_dist); the sqrt only appears
  in the load-time close-point filter, 2d_to_3d.py:443-444 vs :598).
- In-image test is strict: 0 < px < W-1, 0 < py < H-1 on the *unfloored*
  pixel coordinates (2d_to_3d.py:597-605).
- The reference's `logical_and(floored_points, masked_pixels[...])`
  (2d_to_3d.py:608-613) implicitly drops points whose floored x or y is 0;
  reproduced via fx >= 1 & fy >= 1.
- Masks are stored (W, H) i.e. indexed [x, y] (gen_2d_masks_detic.py:468).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cm3d_tpu.geometry.pointcloud import project_to_camera
from cm3d_tpu.ops.erosion import erode3x3
from cm3d_tpu.ops.medoid import masked_medoid
from cm3d_tpu.ops.nms import circle_nms_keep
from cm3d_tpu.ops.pushback import push_centroid
from cm3d_tpu.ops.lanes import nearest_lane


@dataclasses.dataclass(frozen=True)
class LiftParams:
    """Static configuration of the lift step (hashable; safe as a jit static)."""

    min_dist: float = 2.3  # camera-frame depth cutoff (reference :348,598)
    max_points_per_mask: int = 2048  # K: compaction buffer depth
    erode: bool = True  # reference erodes every mask 3x3 (:526-528)


class LiftOutputs(NamedTuple):
    centroids: jax.Array  # [M, 3] global-frame medoid per mask
    has_points: jax.Array  # [M] bool: mask produced a centroid
    point_counts: jax.Array  # [M] int32: points gathered (pre-truncation)
    truncated: jax.Array  # [M] bool: count exceeded K (silent loss in ref)


def lift_keyframe(
    points: jax.Array,
    point_valid: jax.Array,
    cam_ego_t: jax.Array,
    cam_ego_q: jax.Array,
    cam_t: jax.Array,
    cam_q: jax.Array,
    cam_intrinsics: jax.Array,
    masks: jax.Array,
    mask_cam: jax.Array,
    mask_valid: jax.Array,
    params: LiftParams = LiftParams(),
) -> LiftOutputs:
    """Lift every 2D mask of one keyframe to a 3D centroid.

    Args:
      points: [N, D>=3] aggregated sweep points in the GLOBAL frame (padded).
      point_valid: [N] bool.
      cam_ego_t/[C,3], cam_ego_q/[C,4]: ego pose at each camera's timestamp.
      cam_t/[C,3], cam_q/[C,4]: camera extrinsics (sensor->ego).
      cam_intrinsics: [C,3,3], ALREADY scaled by the mask-resolution ratio
        with [2,2] reset to 1 (reference 2d_to_3d.py:585-587).
      masks: [M, W, H] bool/uint8 instance masks, indexed [x, y].
      mask_cam: [M] int32 camera index per mask.
      mask_valid: [M] bool.
    """
    k = params.max_points_per_mask
    m = masks.shape[0]
    n = points.shape[0]
    w, h = masks.shape[1], masks.shape[2]

    if params.erode:
        masks = erode3x3(masks)
    masks = masks.astype(jnp.bool_)

    pts_xyz = points[:, :3].astype(jnp.float32)

    # --- One projection per camera (C small; vmap over cameras). ---
    proj, depths = jax.vmap(
        lambda et, eq, ct, cq, intr: project_to_camera(
            pts_xyz, et, eq, ct, cq, intr, normalize=True
        )
    )(cam_ego_t, cam_ego_q, cam_t, cam_q, cam_intrinsics)
    # proj: [C, N, 3]; depths: [C, N]

    px, py = proj[..., 0], proj[..., 1]
    in_image = (
        point_valid[None, :]
        & (depths > params.min_dist)
        & (px > 0)
        & (px < w - 1)
        & (py > 0)
        & (py < h - 1)
    )  # [C, N]

    fx = jnp.floor(px).astype(jnp.int32)
    fy = jnp.floor(py).astype(jnp.int32)
    # Reference quirk: floored coordinate 0 is dropped by the logical_and.
    in_image = in_image & (fx >= 1) & (fy >= 1)

    flat_idx = jnp.clip(fx, 0, w - 1) * h + jnp.clip(fy, 0, h - 1)  # [C, N]

    # --- Batched in-mask gather: [M, N]. ---
    mask_flat = masks.reshape(m, w * h)
    idx_per_mask = flat_idx[mask_cam]  # [M, N]
    inmask = jnp.take_along_axis(mask_flat, idx_per_mask, axis=1)
    sel = inmask & in_image[mask_cam] & mask_valid[:, None]  # [M, N]

    counts = jnp.sum(sel, axis=1).astype(jnp.int32)  # [M]
    has_points = (counts > 0) & mask_valid
    truncated = counts > k

    # --- Scatter-compaction of selected point indices into [M, K]. ---
    pos = jnp.cumsum(sel, axis=1, dtype=jnp.int32) - 1  # [M, N]
    cols = jnp.where(sel, pos, k)  # k -> dropped
    rows = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32)[:, None], (m, n))
    point_ids = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (m, n))
    idx_buf = jnp.zeros((m, k), jnp.int32).at[rows, cols].set(point_ids, mode="drop")

    valid_k = jnp.arange(k)[None, :] < jnp.minimum(counts, k)[:, None]  # [M, K]
    coords = pts_xyz[idx_buf]  # [M, K, 3]

    # --- Medoid per mask (reference get_medoid, 2d_to_3d.py:116-119). ---
    med_local = masked_medoid(coords, valid_k)  # [M]
    med_global = jnp.take_along_axis(idx_buf, med_local[:, None], axis=1)[:, 0]
    centroids = pts_xyz[med_global]
    centroids = jnp.where(has_points[:, None], centroids, 0.0)

    return LiftOutputs(centroids, has_points, counts, truncated)


class BoxOutputs(NamedTuple):
    centers: jax.Array  # [M, 3] final (possibly pushed-back) centers
    sizes: jax.Array  # [M, 3] (w, l, h) shape-prior extents
    yaws: jax.Array  # [M] box yaw (0 for non-vehicle classes)
    scores: jax.Array  # [M]
    labels: jax.Array  # [M] int32
    keep: jax.Array  # [M] bool: valid AND survived circle NMS
    lane_dist: jax.Array  # [M] distance to the nearest lane point


def build_boxes(
    centroids: jax.Array,
    has_points: jax.Array,
    labels: jax.Array,
    scores: jax.Array,
    lane_points: jax.Array,
    lane_valid: jax.Array,
    ego_translation: jax.Array,
    shape_priors: jax.Array,
    is_vehicle_class: jax.Array,
    nms_radius_sq: jax.Array,
) -> BoxOutputs:
    """Pass 2 of the reference (2d_to_3d.py:733-825) + per-sample circle NMS.

    Args:
      centroids/[M,3], has_points/[M]: from `lift_keyframe`.
      labels: [M] int32 canonical class ids.
      scores: [M] detection scores.
      lane_points: [L, 3] (x, y, yaw); lane_valid: [L] bool.
      ego_translation: [3] LIDAR_TOP ego position at the keyframe.
      shape_priors: [num_classes, 3] (w, l, h) per class
        (cfg/shape_priors_chatgpt.json).
      is_vehicle_class: [num_classes] bool — classes that get lane yaw +
        pushback (reference :763: car, truck, bus, construction_vehicle,
        trailer, barrier).
      nms_radius_sq: [num_classes] circle-NMS squared radii (:850-861).
    """
    yaw_raw, lane_dist, _ = nearest_lane(centroids[:, :2], lane_points, lane_valid)

    veh = is_vehicle_class[labels] & has_points
    sizes = shape_priors[labels]
    yaws = jnp.where(veh, yaw_raw, 0.0)

    pushed = push_centroid(centroids, sizes, yaws, ego_translation)
    centers = jnp.where(veh[:, None], pushed, centroids)

    keep = circle_nms_keep(
        centers[:, :2], scores, labels, has_points, nms_radius_sq
    )
    return BoxOutputs(centers, sizes, yaws, scores, labels, keep & has_points, lane_dist)
