"""Golden tests for quaternion / SE(3) utilities against scipy."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from cm3d_tpu.geometry import (
    apply_se3,
    compose,
    invert_se3,
    quat_inverse,
    quat_multiply,
    quat_to_rotmat,
    quat_to_yaw,
    rotmat_to_quat,
    transform_matrix,
    yaw_rotmat,
    yaw_to_quat,
)

RNG = np.random.default_rng(0)


def random_quats(n):
    q = RNG.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def scipy_rotmat(q_wxyz):
    # scipy uses (x, y, z, w)
    return R.from_quat(np.roll(q_wxyz, -1, axis=-1)).as_matrix()


def test_quat_to_rotmat_matches_scipy():
    q = random_quats(64)
    ours = np.asarray(quat_to_rotmat(jnp.asarray(q, jnp.float32)))
    ref = scipy_rotmat(q)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_rotmat_to_quat_roundtrip():
    q = random_quats(64)
    # canonicalize w >= 0 as ours does
    q = np.where(q[:, :1] < 0, -q, q)
    m = scipy_rotmat(q)
    back = np.asarray(rotmat_to_quat(jnp.asarray(m, jnp.float32)))
    np.testing.assert_allclose(back, q, atol=1e-5)


def test_yaw_quat_roundtrip():
    yaws = np.linspace(-np.pi + 1e-3, np.pi - 1e-3, 37)
    q = yaw_to_quat(jnp.asarray(yaws, jnp.float32))
    back = np.asarray(quat_to_yaw(q))
    np.testing.assert_allclose(back, yaws, atol=1e-5)
    m = np.asarray(yaw_rotmat(jnp.asarray(yaws, jnp.float32)))
    ref = R.from_euler("z", yaws[:, None]).as_matrix()
    np.testing.assert_allclose(m, ref, atol=1e-6)


def test_quat_multiply_and_inverse():
    q1, q2 = random_quats(16), random_quats(16)
    prod = np.asarray(quat_multiply(jnp.asarray(q1, jnp.float32), jnp.asarray(q2, jnp.float32)))
    ref = scipy_rotmat(q1) @ scipy_rotmat(q2)
    np.testing.assert_allclose(scipy_rotmat(prod), ref, atol=1e-5)

    inv = np.asarray(quat_inverse(jnp.asarray(q1, jnp.float32)))
    ident = np.asarray(quat_to_rotmat(quat_multiply(jnp.asarray(q1, jnp.float32), jnp.asarray(inv))))
    np.testing.assert_allclose(ident, np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)


def test_transform_matrix_inverse_semantics():
    """transform_matrix(t, q, inverse=True) must equal inv(transform_matrix(t, q)),
    the contract the devkit helper has (reference src/nuscenes/utils/pcd.py:89-93)."""
    q = random_quats(8)
    t = RNG.normal(size=(8, 3)) * 100
    fwd = np.asarray(transform_matrix(jnp.asarray(t, jnp.float32), jnp.asarray(q, jnp.float32)))
    inv = np.asarray(
        transform_matrix(jnp.asarray(t, jnp.float32), jnp.asarray(q, jnp.float32), inverse=True)
    )
    prod = fwd @ inv
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-3)

    inv2 = np.asarray(invert_se3(jnp.asarray(fwd)))
    np.testing.assert_allclose(inv2, inv, atol=1e-3)


def test_compose_and_apply():
    q = random_quats(3)
    t = RNG.normal(size=(3, 3)) * 10
    mats = [
        np.asarray(transform_matrix(jnp.asarray(t[i], jnp.float32), jnp.asarray(q[i], jnp.float32)))
        for i in range(3)
    ]
    fused = np.asarray(compose(*[jnp.asarray(m) for m in mats]))
    ref = mats[0] @ mats[1] @ mats[2]
    np.testing.assert_allclose(fused, ref, atol=1e-4)

    pts = RNG.normal(size=(50, 3)).astype(np.float32)
    out = np.asarray(apply_se3(jnp.asarray(fused), jnp.asarray(pts)))
    homog = np.concatenate([pts, np.ones((50, 1), np.float32)], -1)
    ref_pts = (ref @ homog.T).T[:, :3]
    np.testing.assert_allclose(out, ref_pts, atol=1e-3)
