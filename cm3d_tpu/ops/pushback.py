"""Centroid pushback along the viewing ray (vectorized).

The reference pushes each vehicle's medoid centroid away from the ego vehicle
by the distance from the box surface to its center along the viewing ray
(`push_centroid`, src/nuscenes/2d_to_3d.py:164-198): the medoid of the
*visible* points sits on the near surface, so the box center lies roughly
half an extent behind it.

Reference quirks reproduced deliberately:
- It reads `l = extents[0]; w = extents[1]` while extents are stored
  (w, l, h) — i.e. the roles of width/length are swapped in the offset
  formula. We reproduce that exact arithmetic for box parity.
- It converts the yaw quaternion through a scipy xyz-euler round trip with a
  (w,x,y,z)->(x,y,z,w) layout confusion, yielding theta = yaw - pi. Since the
  offset only uses |sin(theta - alpha)| and |cos(theta - alpha)|, that is
  IDENTICAL to using the lane yaw directly; we use the yaw directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def push_centroid(
    centroids: jax.Array,
    extents_wlh: jax.Array,
    yaws: jax.Array,
    ego_translation: jax.Array,
) -> jax.Array:
    """Push centroids back along the ego->centroid ray.

    Args:
      centroids: [M, 3] global-frame centroids.
      extents_wlh: [M, 3] box sizes (w, l, h).
      yaws: [M] box yaw (the lane yaw in the pipeline).
      ego_translation: [3] ego position (LIDAR_TOP ego pose at the keyframe,
        reference 2d_to_3d.py:793-796).

    Returns pushed centroids [M, 3] (z unchanged).
    """
    ego_centroid = centroids - ego_translation[None, :]

    # Reference swap: 'l' <- extents[0] (the width), 'w' <- extents[1] (the length).
    l_swapped = extents_wlh[..., 0]
    w_swapped = extents_wlh[..., 1]

    ex, ey = ego_centroid[..., 0], ego_centroid[..., 1]
    # alpha = atan(|y|/|x|) with explicit quadrant fixes == atan2(y, x)
    # (reference 2d_to_3d.py:180-190).
    alpha = jnp.arctan2(ey, ex)

    # theta = yaw - pi via the reference's euler round trip; only |sin|/|cos|
    # of (theta - alpha) are used, so shifting by pi changes nothing.
    theta = yaws

    s = jnp.abs(jnp.sin(theta - alpha))
    c = jnp.abs(jnp.cos(theta - alpha))
    off_w = jnp.abs(w_swapped / (2.0 * jnp.where(s < 1e-12, 1e-12, s)))
    off_l = jnp.abs(l_swapped / (2.0 * jnp.where(c < 1e-12, 1e-12, c)))
    offset = jnp.minimum(off_w, off_l)

    x_dash = centroids[..., 0] + offset * jnp.cos(alpha)
    y_dash = centroids[..., 1] + offset * jnp.sin(alpha)
    return jnp.stack([x_dash, y_dash, centroids[..., 2]], axis=-1)
