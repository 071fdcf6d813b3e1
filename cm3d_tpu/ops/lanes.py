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
    reference's np.argmin semantics.
    """
    diff = centroids_xy[:, None, :] - lane_points[None, :, :2]  # [M, L, 2]
    dist_sq = jnp.sum(diff * diff, axis=-1)
    if lane_valid is not None:
        dist_sq = jnp.where(lane_valid[None, :], dist_sq, jnp.inf)
    idx = jnp.argmin(dist_sq, axis=-1)
    yaws = lane_points[idx, 2]
    distances = jnp.sqrt(jnp.take_along_axis(dist_sq, idx[:, None], axis=1))[:, 0]
    coords = lane_points[idx, :2]
    return yaws, distances, coords
