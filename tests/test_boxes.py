"""Tests for box corner computation and exact rotated BEV IoU."""

import numpy as np
import jax.numpy as jnp

from cm3d_tpu.geometry import box_corners_3d, box_corners_bev, boxes_to_7dof
from cm3d_tpu.geometry.boxes import rotated_iou_bev


def test_axis_aligned_corners():
    c = jnp.asarray([[0.0, 0.0]])
    size = jnp.asarray([[2.0, 4.0, 1.0]])  # w=2, l=4, h=1
    corners = np.asarray(box_corners_bev(c, size, jnp.asarray([0.0])))[0]
    expected = {(2.0, 1.0), (2.0, -1.0), (-2.0, -1.0), (-2.0, 1.0)}
    got = {(round(float(x), 5), round(float(y), 5)) for x, y in corners}
    assert got == expected


def test_corners_3d_z_faces():
    c = jnp.asarray([[1.0, 2.0, 3.0]])
    size = jnp.asarray([[2.0, 4.0, 2.0]])
    corners = np.asarray(box_corners_3d(c, size, jnp.asarray([0.3])))[0]
    assert corners.shape == (8, 3)
    np.testing.assert_allclose(corners[:4, 2], 2.0)
    np.testing.assert_allclose(corners[4:, 2], 4.0)


def test_7dof_packing():
    c = jnp.asarray([[1.0, 2.0, 3.0]])
    size = jnp.asarray([[2.0, 4.0, 2.0]])
    out = np.asarray(boxes_to_7dof(c, size, jnp.asarray([0.5])))[0]
    np.testing.assert_allclose(out, [1, 2, 2, 4, 2, 2, 0.5])


def test_iou_identical_boxes():
    boxes = jnp.asarray([[0.0, 0.0, 2.0, 4.0, 0.3]])
    iou = np.asarray(rotated_iou_bev(boxes, boxes))
    np.testing.assert_allclose(iou, [[1.0]], atol=1e-5)


def test_iou_disjoint():
    a = jnp.asarray([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b = jnp.asarray([[10.0, 10.0, 2.0, 2.0, 1.0]])
    iou = np.asarray(rotated_iou_bev(a, b))
    np.testing.assert_allclose(iou, [[0.0]], atol=1e-7)


def test_iou_axis_aligned_overlap():
    # two unit squares offset by 0.5 in x: inter = 0.5, union = 1.5
    a = jnp.asarray([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b = jnp.asarray([[0.5, 0.0, 1.0, 1.0, 0.0]])
    iou = np.asarray(rotated_iou_bev(a, b))
    np.testing.assert_allclose(iou, [[0.5 / 1.5]], atol=1e-5)


def test_iou_rotated_45_degrees():
    # unit square vs same square rotated 45deg: known IoU = 2*(sqrt2-1)/(2-(sqrt2-1)... )
    # compute oracle by monte carlo
    a = jnp.asarray([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b = jnp.asarray([[0.0, 0.0, 1.0, 1.0, np.pi / 4]])
    iou = float(np.asarray(rotated_iou_bev(a, b))[0, 0])

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, size=(200000, 2))
    in_a = (np.abs(pts[:, 0]) <= 0.5) & (np.abs(pts[:, 1]) <= 0.5)
    c, s = np.cos(np.pi / 4), np.sin(np.pi / 4)
    rot = pts @ np.array([[c, s], [-s, c]])
    in_b = (np.abs(rot[:, 0]) <= 0.5) & (np.abs(rot[:, 1]) <= 0.5)
    mc_iou = (in_a & in_b).sum() / (in_a | in_b).sum()
    assert abs(iou - mc_iou) < 0.01


def test_iou_batched_shapes():
    rng = np.random.default_rng(2)
    a = rng.uniform(-5, 5, size=(7, 5)).astype(np.float32)
    b = rng.uniform(-5, 5, size=(11, 5)).astype(np.float32)
    a[:, 2:4] = np.abs(a[:, 2:4]) + 0.5
    b[:, 2:4] = np.abs(b[:, 2:4]) + 0.5
    iou = np.asarray(rotated_iou_bev(jnp.asarray(a), jnp.asarray(b)))
    assert iou.shape == (7, 11)
    assert (iou >= -1e-6).all() and (iou <= 1 + 1e-6).all()
