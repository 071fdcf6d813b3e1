"""Golden tests for point-cloud ops vs a plain-numpy oracle that replicates
the reference torch semantics (src/nuscenes/utils/pcd.py)."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from cm3d_tpu.geometry import (
    project_to_camera,
    remove_close_mask,
    rotate_points,
    transform_points,
    translate_points,
    view_points,
)

RNG = np.random.default_rng(1)


def test_remove_close_mask():
    """Reference pcd.py:148-157: remove iff |x| < r AND |y| < r."""
    pts = np.array([[0.1, 0.1, 5, 1], [5, 0.1, 0, 1], [0.1, 5, 0, 1], [5, 5, 0, 1]], np.float32)
    mask = np.asarray(remove_close_mask(jnp.asarray(pts), 1.0))
    np.testing.assert_array_equal(mask, [False, True, True, True])


def test_rotate_translate_transform():
    pts = RNG.normal(size=(100, 4)).astype(np.float32)
    rot = R.random(random_state=3).as_matrix().astype(np.float32)
    t = RNG.normal(size=3).astype(np.float32)

    out = np.asarray(rotate_points(jnp.asarray(pts), jnp.asarray(rot)))
    np.testing.assert_allclose(out[:, :3], (rot @ pts[:, :3].T).T, atol=1e-5)
    np.testing.assert_array_equal(out[:, 3], pts[:, 3])

    out = np.asarray(translate_points(jnp.asarray(pts), jnp.asarray(t)))
    np.testing.assert_allclose(out[:, :3], pts[:, :3] + t, atol=1e-6)

    tm = np.eye(4, dtype=np.float32)
    tm[:3, :3] = rot
    tm[:3, 3] = t
    out = np.asarray(transform_points(jnp.asarray(pts), jnp.asarray(tm)))
    np.testing.assert_allclose(out[:, :3], (rot @ pts[:, :3].T).T + t, atol=1e-5)


def numpy_view_points(points_3xn, view, normalize):
    """Oracle: reference view_points (src/nuscenes/utils/pcd.py:262-283)."""
    viewpad = np.eye(4, dtype=np.float32)
    viewpad[: view.shape[0], : view.shape[1]] = view
    n = points_3xn.shape[1]
    homog = np.concatenate([points_3xn, np.ones((1, n), np.float32)])
    proj = (viewpad @ homog)[:3]
    depths = proj[2].copy()
    if normalize:
        proj = proj / proj[2:3]
    return proj, depths


def test_view_points_matches_reference():
    pts = RNG.normal(size=(200, 3)).astype(np.float32)
    pts[:, 2] += 10  # keep in front
    intr = np.array([[1266.4, 0, 816.2], [0, 1266.4, 491.5], [0, 0, 1]], np.float32)
    for normalize in (True, False):
        ours_p, ours_d = view_points(jnp.asarray(pts), jnp.asarray(intr), normalize=normalize)
        ref_p, ref_d = numpy_view_points(pts.T, intr, normalize)
        np.testing.assert_allclose(np.asarray(ours_p), ref_p.T, rtol=1e-5, atol=1e-2)
        np.testing.assert_allclose(np.asarray(ours_d), ref_d, rtol=1e-6)


def test_project_to_camera_matches_sequential_chain():
    """project_to_camera == the reference's translate/rotate sequence
    (src/nuscenes/2d_to_3d.py:569-590)."""
    pts = (RNG.normal(size=(300, 3)) * 20).astype(np.float32)
    ego_t = np.array([100.0, 200.0, 0.5], np.float32)
    ego_q = R.from_euler("z", 0.7).as_quat()[[3, 0, 1, 2]].astype(np.float32)
    cam_t = np.array([1.5, 0.2, 1.6], np.float32)
    cam_q = R.from_euler("xyz", [-1.57, 0.01, -1.57]).as_quat()[[3, 0, 1, 2]].astype(np.float32)
    intr = np.array([[800.0, 0, 512], [0, 800.0, 288], [0, 0, 1]], np.float32)

    # oracle: sequential chain with numpy
    ego_rot = R.from_quat(np.roll(ego_q, -1)).as_matrix()
    cam_rot = R.from_quat(np.roll(cam_q, -1)).as_matrix()
    p = pts - ego_t
    p = (ego_rot.T @ p.T).T
    p = p - cam_t
    p = (cam_rot.T @ p.T).T
    ref_p, ref_d = numpy_view_points(p.T.astype(np.float32), intr, True)

    ours_p, ours_d = project_to_camera(
        jnp.asarray(pts),
        jnp.asarray(ego_t),
        jnp.asarray(ego_q),
        jnp.asarray(cam_t),
        jnp.asarray(cam_q),
        jnp.asarray(intr),
    )
    np.testing.assert_allclose(np.asarray(ours_d), ref_d, rtol=1e-4, atol=1e-3)
    sel = np.abs(ref_d) > 1.0  # avoid near-plane blowups in comparison
    np.testing.assert_allclose(np.asarray(ours_p)[sel], ref_p.T[sel], rtol=1e-3, atol=0.1)
