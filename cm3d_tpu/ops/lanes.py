"""Nearest-lane yaw assignment.

The reference gathers every centroid in a scene, then runs one big
scipy cdist against all discretized lane points and takes the argmin row-wise
(src/nuscenes/2d_to_3d.py:277-302). Each centroid's lookup is independent, so
on TPU this is just a batched distance argmin — no scene barrier needed; it
shards freely over the keyframe mesh axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nearest_lane(
    centroids_xy: jax.Array,
    lane_points: jax.Array,
    lane_valid: jax.Array | None = None,
):
    """For each centroid, the yaw/distance/coords of the closest lane point.

    Args:
      centroids_xy: [M, 2].
      lane_points: [L, 3] (x, y, yaw) discretized lane points (padded).
      lane_valid: [L] bool or None.

    Returns (yaws [M], distances [M], coords [M, 2]).
    Euclidean distance on (x, y) only, argmin first-index tie-break — the
    reference's np.argmin semantics. With NO valid lane points the yaws/
    coords are 0 and every distance is inf (documented deviation: the
    reference would crash on an empty cdist argmin; inf distances let
    lane_dist_filter drop the boxes when it is on).
    """
    diff = centroids_xy[:, None, :] - lane_points[None, :, :2]  # [M, L, 2]
    dist_sq = jnp.sum(diff * diff, axis=-1)
    if lane_valid is not None:
        dist_sq = jnp.where(lane_valid[None, :], dist_sq, jnp.inf)
    idx = jnp.argmin(dist_sq, axis=-1)
    # min == value at argmin: a reduction instead of an [M]-row gather
    # (TPU gather cost tracks index rows); one row gather serves yaw+coords
    distances = jnp.sqrt(jnp.min(dist_sq, axis=-1))
    pts = lane_points[idx]  # [M, 3]
    if lane_valid is not None:
        any_valid = jnp.any(lane_valid)
        pts = jnp.where(any_valid, pts, 0.0)
    return pts[:, 2], distances, pts[:, :2]
