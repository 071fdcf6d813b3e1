"""Quaternion and SE(3) utilities (JAX, batched, differentiable).

Replaces the reference's dependency on `pyquaternion.Quaternion` and
`nuscenes.utils.geometry_utils.transform_matrix`
(reference: src/nuscenes/utils/pcd.py:89-114 uses transform_matrix;
src/nuscenes/2d_to_3d.py:451-457 uses Quaternion(...).rotation_matrix).

Conventions:
- Quaternions are `[w, x, y, z]` (Hamilton, scalar-first) — the same layout
  the nuScenes devkit / pyquaternion use, so calibration records round-trip
  unchanged.
- SE(3) transforms are 4x4 homogeneous matrices acting on column vectors.
- All functions accept leading batch dimensions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Geometry matmuls are tiny-contraction (K=3/4) but feed metric-space
# coordinates (~1e3 m in the global frame): on TPU the default bf16 MXU pass
# would cost ~centimeters of error, so pin true-f32 precision. The FLOP cost
# is negligible at these shapes.
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Quaternion [..., 4] (w, x, y, z) -> rotation matrix [..., 3, 3].

    Normalizes the input, so non-unit quaternions are handled like
    pyquaternion's `.rotation_matrix`.
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    rows = [
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def rotmat_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix [..., 3, 3] -> quaternion [..., 4] (w, x, y, z).

    Uses the Shepperd / max-trace branch-free formulation: computes all four
    candidate quaternions and selects the numerically best with `where`
    (XLA-friendly — no data-dependent branching).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidates, each valid when its pivot is the largest.
    qw = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 + m11 - m00 - m22, 1.0 + m22 - m00 - m11],
        axis=-1,
    )
    qw = jnp.sqrt(jnp.maximum(qw, 1e-12)) / 2.0
    w0, x1, y2, z3 = qw[..., 0], qw[..., 1], qw[..., 2], qw[..., 3]

    cand0 = jnp.stack(
        [w0, (m21 - m12) / (4 * w0), (m02 - m20) / (4 * w0), (m10 - m01) / (4 * w0)],
        axis=-1,
    )
    cand1 = jnp.stack(
        [(m21 - m12) / (4 * x1), x1, (m01 + m10) / (4 * x1), (m02 + m20) / (4 * x1)],
        axis=-1,
    )
    cand2 = jnp.stack(
        [(m02 - m20) / (4 * y2), (m01 + m10) / (4 * y2), y2, (m12 + m21) / (4 * y2)],
        axis=-1,
    )
    cand3 = jnp.stack(
        [(m10 - m01) / (4 * z3), (m02 + m20) / (4 * z3), (m12 + m21) / (4 * z3), z3],
        axis=-1,
    )

    pivots = jnp.stack([tr, m00, m11, m22], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([cand0, cand1, cand2, cand3], axis=-2)  # [..., 4, 4]
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)
    q = jnp.squeeze(q, axis=-2)
    # Canonicalize sign (w >= 0), matching pyquaternion's constructor output
    # for yaw-only matrices used by the pipeline.
    q = jnp.where(q[..., :1] < 0, -q, q)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def yaw_to_quat(yaw: jax.Array) -> jax.Array:
    """Yaw angle [...,] -> quaternion [..., 4] for rotation about +z."""
    half = yaw / 2.0
    zeros = jnp.zeros_like(yaw)
    return jnp.stack([jnp.cos(half), zeros, zeros, jnp.sin(half)], axis=-1)


def quat_to_yaw(q: jax.Array) -> jax.Array:
    """Extract yaw (rotation about +z) from quaternion [..., 4]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))


def yaw_rotmat(yaw: jax.Array) -> jax.Array:
    """Yaw angle [...,] -> 3x3 rotation matrix about +z.

    Mirrors the reference's `align_mat` construction
    (src/nuscenes/2d_to_3d.py:788-789).
    """
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    zeros = jnp.zeros_like(yaw)
    ones = jnp.ones_like(yaw)
    rows = [
        jnp.stack([c, -s, zeros], axis=-1),
        jnp.stack([s, c, zeros], axis=-1),
        jnp.stack([zeros, zeros, ones], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def quat_multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product of two [..., 4] quaternions (w, x, y, z)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_inverse(q: jax.Array) -> jax.Array:
    """Inverse of a unit quaternion [..., 4]: conjugate."""
    return jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)


def transform_matrix(
    translation: jax.Array, rotation_quat: jax.Array, inverse: bool = False
) -> jax.Array:
    """Build a 4x4 homogeneous transform from translation [..., 3] and
    quaternion [..., 4].

    `inverse=True` returns the inverse transform directly, matching the
    nuScenes devkit helper the reference relies on
    (src/nuscenes/utils/pcd.py:89-93).
    """
    rot = quat_to_rotmat(rotation_quat)
    batch = jnp.broadcast_shapes(rot.shape[:-2], translation.shape[:-1])
    rot = jnp.broadcast_to(rot, batch + (3, 3))
    translation = jnp.broadcast_to(translation, batch + (3,))
    if inverse:
        rot_t = jnp.swapaxes(rot, -1, -2)
        trans = -_einsum("...ij,...j->...i", rot_t, translation)
        rot = rot_t
        translation = trans
    tm = jnp.zeros(batch + (4, 4), dtype=rot.dtype)
    tm = tm.at[..., :3, :3].set(rot)
    tm = tm.at[..., :3, 3].set(translation)
    tm = tm.at[..., 3, 3].set(1.0)
    return tm


def invert_se3(tm: jax.Array) -> jax.Array:
    """Invert a [..., 4, 4] rigid transform without a general inverse."""
    rot = tm[..., :3, :3]
    trans = tm[..., :3, 3]
    rot_t = jnp.swapaxes(rot, -1, -2)
    new_trans = -_einsum("...ij,...j->...i", rot_t, trans)
    out = jnp.zeros_like(tm)
    out = out.at[..., :3, :3].set(rot_t)
    out = out.at[..., :3, 3].set(new_trans)
    out = out.at[..., 3, 3].set(1.0)
    return out


def compose(*transforms: jax.Array) -> jax.Array:
    """Compose 4x4 transforms left-to-right in application order of matmul:
    compose(A, B, C) == A @ B @ C.

    The reference fuses its per-sweep chain the same way
    (src/nuscenes/utils/pcd.py:114 `reduce(torch.matmul, [...])`).
    """
    out = transforms[0]
    for t in transforms[1:]:
        out = _einsum("...ij,...jk->...ik", out, t)
    return out


def apply_se3(tm: jax.Array, points: jax.Array) -> jax.Array:
    """Apply [..., 4, 4] transform to points [..., N, 3] -> [..., N, 3]."""
    rot = tm[..., :3, :3]
    trans = tm[..., :3, 3]
    return _einsum("...ij,...nj->...ni", rot, points) + trans[..., None, :]
