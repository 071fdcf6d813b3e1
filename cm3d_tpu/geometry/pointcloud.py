"""Functional point-cloud ops (JAX, fixed-shape, mask-carrying).

Replaces the reference's mutable `LidarPointCloud` class
(src/nuscenes/utils/pcd.py:20-257). Where the reference filters points by
slicing (dynamic shapes), we carry a boolean validity mask so every shape is
static and XLA can tile the math onto the VPU/MXU.

Point layout: `[N, D]` with x, y, z in columns 0..2. Batched variants accept
leading dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cm3d_tpu.geometry.se3 import _einsum


def remove_close_mask(points: jax.Array, radius: float) -> jax.Array:
    """Validity mask for points outside `radius` (L-inf on x, y).

    Reference semantics (src/nuscenes/utils/pcd.py:148-157): a point is
    removed when |x| < radius AND |y| < radius. Returns True for points kept.
    """
    x_close = jnp.abs(points[..., 0]) < radius
    y_close = jnp.abs(points[..., 1]) < radius
    return ~(x_close & y_close)


def rotate_points(points: jax.Array, rot: jax.Array) -> jax.Array:
    """Rotate xyz columns of [..., N, D] by [..., 3, 3]; other columns pass through.

    Reference: PointCloud.rotate (src/nuscenes/utils/pcd.py:167-172).
    """
    xyz = _einsum("...ij,...nj->...ni", rot, points[..., :3])
    return jnp.concatenate([xyz, points[..., 3:]], axis=-1)


def translate_points(points: jax.Array, t: jax.Array) -> jax.Array:
    """Translate xyz columns of [..., N, D] by [..., 3].

    Reference: PointCloud.translate (src/nuscenes/utils/pcd.py:159-165).
    """
    xyz = points[..., :3] + t[..., None, :]
    return jnp.concatenate([xyz, points[..., 3:]], axis=-1)


def transform_points(points: jax.Array, tm: jax.Array) -> jax.Array:
    """Apply [..., 4, 4] homogeneous transform to xyz of [..., N, D].

    Reference: PointCloud.transform (src/nuscenes/utils/pcd.py:174-179).
    """
    rot = tm[..., :3, :3]
    trans = tm[..., :3, 3]
    xyz = _einsum("...ij,...nj->...ni", rot, points[..., :3]) + trans[..., None, :]
    return jnp.concatenate([xyz, points[..., 3:]], axis=-1)


def view_points(points: jax.Array, view: jax.Array, normalize: bool = True):
    """Pinhole projection. points [..., N, 3], view [..., V0, V1] (V<=4).

    Returns (projected [..., N, 3], depths [..., N]). `depths` is the
    pre-normalization third row, exactly like the reference's torch port
    (src/nuscenes/utils/pcd.py:262-283): the view matrix is padded into a
    4x4 identity, applied in homogeneous coordinates, and rows divided by z
    when `normalize`.
    """
    v0, v1 = view.shape[-2], view.shape[-1]
    batch = view.shape[:-2]
    viewpad = jnp.zeros(batch + (4, 4), dtype=points.dtype)
    viewpad = viewpad.at[..., jnp.arange(4), jnp.arange(4)].set(1.0)
    viewpad = viewpad.at[..., :v0, :v1].set(view)

    ones = jnp.ones(points.shape[:-1] + (1,), dtype=points.dtype)
    homog = jnp.concatenate([points, ones], axis=-1)  # [..., N, 4]
    proj = _einsum("...ij,...nj->...ni", viewpad, homog)[..., :3]
    depths = proj[..., 2]
    if normalize:
        proj = proj / depths[..., None]
    return proj, depths


def project_to_camera(
    points_global: jax.Array,
    ego_translation: jax.Array,
    ego_rotation: jax.Array,
    cam_translation: jax.Array,
    cam_rotation: jax.Array,
    intrinsics: jax.Array,
    normalize: bool = True,
):
    """Global-frame points -> image pixels through an ego+camera chain.

    Mirrors the reference's per-mask transform sequence
    (src/nuscenes/2d_to_3d.py:569-590): translate by -ego_t, rotate by
    ego_R^T, translate by -cam_t, rotate by cam_R^T, then `view_points` with
    the (pre-scaled) intrinsics. Unlike the reference — which redoes this for
    every mask — callers run it once per camera and reuse the projection for
    all masks of that camera.

    Args:
      points_global: [..., N, 3] points in the global frame.
      ego_translation/[...,3], ego_rotation/[...,4] quat (w,x,y,z): ego pose
        at the camera timestamp.
      cam_translation/[...,3], cam_rotation/[...,4] quat: camera extrinsics.
      intrinsics: [..., 3, 3].

    Returns (pixels [..., N, 3], depths [..., N]) with depths = camera-frame z.
    """
    from cm3d_tpu.geometry.se3 import quat_to_rotmat

    ego_rot = quat_to_rotmat(ego_rotation)
    cam_rot = quat_to_rotmat(cam_rotation)

    pts = points_global - ego_translation[..., None, :]
    pts = _einsum("...ji,...nj->...ni", ego_rot, pts)  # R^T @ p
    pts = pts - cam_translation[..., None, :]
    pts = _einsum("...ji,...nj->...ni", cam_rot, pts)

    return view_points(pts, intrinsics, normalize=normalize)
