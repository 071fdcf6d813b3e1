"""Waymo range-image -> point-cloud unprojection as a JAX kernel.

Replaces frame_utils.parse_range_image_and_camera_projection +
convert_range_image_to_point_cloud (TF C++ ops; reference
src/waymo/2d_to_3d.py:472-474) with the published spherical unprojection
semantics: per-row beam inclinations, per-column azimuth with the
extrinsic yaw correction, polar->cartesian in the sensor frame, then the
sensor extrinsic into the vehicle frame. A per-pixel [H, W, 4, 4] pose grid
(TOP lidar rolling shutter) is supported optionally.

This is a pure per-pixel transform — ideal TPU work (SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def azimuth_grid(width: int, extrinsic: jax.Array) -> jax.Array:
    """Per-column azimuth: pi - 2*pi*(col+0.5)/W, corrected by the sensor's
    extrinsic yaw."""
    correction = jnp.arctan2(extrinsic[1, 0], extrinsic[0, 0])
    ratios = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    return jnp.pi - 2.0 * jnp.pi * ratios - correction


def uniform_inclinations(height: int, incl_min: float, incl_max: float) -> jax.Array:
    """Row inclinations for lidars without a beam table: uniform from max
    (top row) to min (bottom row)."""
    ratios = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    return incl_max + ratios * (incl_min - incl_max)


def pixel_pose_matrices(pose6: jax.Array) -> jax.Array:
    """[H, W, 6] (roll, pitch, yaw, x, y, z) -> [H, W, 4, 4] vehicle->global
    transforms (waymo transform_utils.get_rotation_matrix semantics:
    R = Rz(yaw) @ Ry(pitch) @ Rx(roll)). All-zero rows (Waymo's invalid
    pixels) become the identity transform — harmless, those pixels carry
    range <= 0 and are dropped by the validity mask anyway."""
    roll, pitch, yaw = pose6[..., 0], pose6[..., 1], pose6[..., 2]
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    rot = jnp.stack(
        [
            jnp.stack([cy * cp, cy * sp * sr - sy * cr,
                       cy * sp * cr + sy * sr], axis=-1),
            jnp.stack([sy * cp, sy * sp * sr + cy * cr,
                       sy * sp * cr - cy * sr], axis=-1),
            jnp.stack([-sp, cp * sr, cp * cr], axis=-1),
        ],
        axis=-2,
    )  # [H, W, 3, 3]
    m = jnp.zeros(pose6.shape[:-1] + (4, 4), pose6.dtype)
    m = m.at[..., :3, :3].set(rot)
    m = m.at[..., :3, 3].set(pose6[..., 3:6])
    m = m.at[..., 3, 3].set(1.0)
    return m


def range_image_to_points(
    range_image: jax.Array,  # [H, W] ranges in meters (<=0 -> invalid)
    inclinations: jax.Array,  # [H] row inclinations, top row first
    extrinsic: jax.Array,  # [4, 4] sensor -> vehicle
    pixel_pose: Optional[jax.Array] = None,  # [H, W, 4, 4] vehicle -> global
    frame_pose_inv: Optional[jax.Array] = None,  # [4, 4] global -> vehicle
) -> Tuple[jax.Array, jax.Array]:
    """Returns (points [H*W, 3] vehicle-frame, valid [H*W] bool).

    All dots run at Precision.HIGHEST: the default TPU f32 dot is bf16 MXU
    passes, and the pose correction routes points through GLOBAL coordinates
    (1e3-1e4 m in Waymo's global frame) where bf16 rounding would be meters —
    larger than the <=1 m rolling-shutter correction itself. Contraction dim
    is 3, so the cost is negligible.
    """
    if pixel_pose is not None and frame_pose_inv is None:
        # Mirrors frame_utils: pixel_pose maps into the GLOBAL frame; without
        # the frame pose to come back, the output silently stops being
        # vehicle-frame.
        raise ValueError("frame_pose_inv must be set when pixel_pose is set")
    _HI = jax.lax.Precision.HIGHEST
    h, w = range_image.shape
    az = azimuth_grid(w, extrinsic)  # [W]
    cos_incl = jnp.cos(inclinations)[:, None]
    sin_incl = jnp.sin(inclinations)[:, None]
    cos_az = jnp.cos(az)[None, :]
    sin_az = jnp.sin(az)[None, :]
    r = range_image
    x = cos_incl * cos_az * r
    y = cos_incl * sin_az * r
    z = sin_incl * r
    pts = jnp.stack([x, y, z], axis=-1)  # [H, W, 3] sensor frame
    pts = jnp.matmul(pts, extrinsic[:3, :3].T, precision=_HI) + extrinsic[:3, 3]

    if pixel_pose is not None:
        # per-pixel vehicle->global, then back into the frame's vehicle frame
        rot = pixel_pose[..., :3, :3]
        t = pixel_pose[..., :3, 3]
        pts = jnp.einsum("hwij,hwj->hwi", rot, pts, precision=_HI) + t
        pts = (
            jnp.matmul(pts, frame_pose_inv[:3, :3].T, precision=_HI)
            + frame_pose_inv[:3, 3]
        )

    valid = (range_image > 0).reshape(-1)
    return pts.reshape(-1, 3), valid


def points_to_range_image(
    points: jax.Array,  # [N, 3] vehicle frame
    inclinations: jax.Array,  # [H]
    extrinsic: jax.Array,  # [4, 4]
    height: int,
    width: int,
) -> jax.Array:
    """Inverse transform (test oracle + completeness): scatter points back
    into an [H, W] range image (last write wins on collisions)."""
    inv = jnp.linalg.inv(extrinsic)
    local = (
        jnp.matmul(points, inv[:3, :3].T, precision=jax.lax.Precision.HIGHEST)
        + inv[:3, 3]
    )
    r = jnp.linalg.norm(local, axis=-1)
    incl = jnp.arcsin(jnp.clip(local[:, 2] / jnp.maximum(r, 1e-9), -1, 1))
    az = jnp.arctan2(local[:, 1], local[:, 0])

    correction = jnp.arctan2(extrinsic[1, 0], extrinsic[0, 0])
    col_f = (jnp.pi - correction - az) * width / (2 * jnp.pi) - 0.5
    col = jnp.round(col_f).astype(jnp.int32) % width
    # nearest row by inclination
    row = jnp.argmin(
        jnp.abs(incl[:, None] - inclinations[None, :]), axis=1
    ).astype(jnp.int32)
    img = jnp.zeros((height, width), points.dtype)
    return img.at[row, col].set(r)
