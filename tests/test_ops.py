"""Unit tests for device ops vs cv2/torch/numpy oracles."""

import numpy as np
import pytest
import jax.numpy as jnp

from cm3d_tpu.ops import (
    circle_nms_keep,
    erode3x3,
    masked_medoid,
    medoid_index,
    nearest_lane,
    nms_2d_classwise,
    push_centroid,
)
from oracle import circle_nms_oracle, push_centroid_oracle

RNG = np.random.default_rng(42)


# ---------------- erosion ----------------


def test_erode3x3_matches_cv2():
    import cv2

    masks = (RNG.random((5, 64, 48)) > 0.4).astype(np.uint8)
    ours = np.asarray(erode3x3(jnp.asarray(masks)))
    kernel = np.ones((3, 3), np.uint8)
    for i in range(5):
        ref = cv2.erode(masks[i], kernel)
        np.testing.assert_array_equal(ours[i], ref)


# ---------------- medoid ----------------


def torch_medoid(points_3k):
    import torch

    t = torch.from_numpy(points_3k)
    dist = torch.cdist(t.T, t.T, p=2)
    return int(torch.argmin(dist.sum(axis=0)))


def test_medoid_matches_torch():
    for k in [1, 2, 7, 150, 400]:
        pts = (RNG.normal(size=(k, 3)) * 5 + np.array([1000.0, 500.0, 1.0])).astype(
            np.float32
        )
        ref = torch_medoid(pts.T)
        ours = int(medoid_index(jnp.asarray(pts), jnp.ones(k, bool)))
        assert ours == ref, f"k={k}: {ours} != {ref}"


def test_masked_medoid_respects_validity():
    pts = RNG.normal(size=(3, 50, 3)).astype(np.float32) * 10
    valid = np.zeros((3, 50), bool)
    valid[0, :10] = True
    valid[1, :37] = True
    valid[2, :1] = True
    ours = np.asarray(masked_medoid(jnp.asarray(pts), jnp.asarray(valid)))
    for m, nv in enumerate([10, 37, 1]):
        ref = torch_medoid(pts[m, :nv].T)
        assert ours[m] == ref


def test_medoid_padding_invariance():
    pts = RNG.normal(size=(1, 20, 3)).astype(np.float32)
    valid = np.ones((1, 20), bool)
    base = int(masked_medoid(jnp.asarray(pts), jnp.asarray(valid))[0])
    padded = np.concatenate([pts, RNG.normal(size=(1, 300, 3)).astype(np.float32)], 1)
    pvalid = np.concatenate([valid, np.zeros((1, 300), bool)], 1)
    assert int(masked_medoid(jnp.asarray(padded), jnp.asarray(pvalid))[0]) == base


# ---------------- circle NMS ----------------


def test_circle_nms_matches_oracle():
    n = 60
    classes = ["car", "pedestrian", "truck"]
    radii = {"car": 4.0, "pedestrian": 0.175, "truck": 12.0}
    centers = RNG.uniform(-20, 20, size=(n, 2))
    scores = RNG.random(n)
    labels_str = [classes[i] for i in RNG.integers(0, 3, n)]

    dets = np.concatenate([centers, scores[:, None]], axis=1)
    keep_ref = set(circle_nms_oracle(dets, labels_str, radii))

    label_ids = np.array([classes.index(l) for l in labels_str], np.int32)
    radius_arr = np.array([radii[c] for c in classes], np.float32)
    keep = np.asarray(
        circle_nms_keep(
            jnp.asarray(centers.astype(np.float32)),
            jnp.asarray(scores.astype(np.float32)),
            jnp.asarray(label_ids),
            jnp.ones(n, bool),
            jnp.asarray(radius_arr),
        )
    )
    assert set(np.where(keep)[0]) == keep_ref


def test_circle_nms_padding():
    centers = np.array([[0, 0], [0.1, 0], [50, 50], [0, 0]], np.float32)
    scores = np.array([0.9, 0.5, 0.8, 0.99], np.float32)
    labels = np.zeros(4, np.int32)
    valid = np.array([True, True, True, False])
    keep = np.asarray(
        circle_nms_keep(
            jnp.asarray(centers),
            jnp.asarray(scores),
            jnp.asarray(labels),
            jnp.asarray(valid),
            jnp.asarray([4.0], np.float32),
        )
    )
    # box3 invalid; box0 kept, box1 suppressed by box0 (dist^2=0.01<=4), box2 kept
    np.testing.assert_array_equal(keep, [True, False, True, False])


# ---------------- 2D NMS (torchvision.ops.nms semantics) ----------------


def nms_oracle(boxes, scores, thr):
    """Greedy axis-aligned NMS, torchvision semantics (suppress iou > thr)."""
    order = np.argsort(-scores, kind="stable")
    keep, suppressed = [], np.zeros(len(scores), bool)
    x1, y1, x2, y2 = boxes.T
    area = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        ix1 = np.maximum(x1[i], x1)
        iy1 = np.maximum(y1[i], y1)
        ix2 = np.minimum(x2[i], x2)
        iy2 = np.minimum(y2[i], y2)
        inter = np.maximum(ix2 - ix1, 0) * np.maximum(iy2 - iy1, 0)
        iou = inter / np.maximum(area[i] + area - inter, 1e-12)
        suppressed |= iou > thr
        suppressed[i] = True  # self (already kept)
    return np.array(keep)


def test_nms2d_matches_oracle():
    n = 80
    boxes = RNG.uniform(0, 100, size=(n, 2))
    wh = RNG.uniform(5, 40, size=(n, 2))
    boxes_xyxy = np.concatenate([boxes, boxes + wh], axis=1).astype(np.float32)
    scores = RNG.random(n).astype(np.float32)
    labels = RNG.integers(0, 3, n).astype(np.int32)

    keep_ref = set()
    for cls in range(3):
        idx = np.where(labels == cls)[0]
        if len(idx) == 0:
            continue
        k = nms_oracle(boxes_xyxy[idx], scores[idx], 0.75)
        keep_ref.update(idx[k])

    keep = np.asarray(
        nms_2d_classwise(
            jnp.asarray(boxes_xyxy),
            jnp.asarray(scores),
            jnp.asarray(labels),
            jnp.ones(n, bool),
            0.75,
        )
    )
    assert set(np.where(keep)[0]) == keep_ref


# ---------------- pushback ----------------


def test_push_centroid_matches_reference_formula():
    for _ in range(50):
        centroid = RNG.uniform(-50, 50, 3)
        centroid[2] = RNG.uniform(-2, 2)
        extents = RNG.uniform(0.5, 12, 3)
        yaw = RNG.uniform(-np.pi, np.pi)
        ego = RNG.uniform(-50, 50, 3)
        if abs(centroid[0] - ego[0]) < 1e-3:
            continue
        ref = push_centroid_oracle(centroid, extents, yaw, ego)
        ours = np.asarray(
            push_centroid(
                jnp.asarray(centroid[None].astype(np.float32)),
                jnp.asarray(extents[None].astype(np.float32)),
                jnp.asarray(np.array([yaw], np.float32)),
                jnp.asarray(ego.astype(np.float32)),
            )
        )[0]
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


# ---------------- lanes ----------------


def test_nearest_lane_matches_scipy():
    from scipy.spatial.distance import cdist

    centroids = RNG.uniform(-100, 100, size=(40, 2)).astype(np.float32)
    lanes = RNG.uniform(-100, 100, size=(500, 3)).astype(np.float32)
    yaws, dists, coords = nearest_lane(jnp.asarray(centroids), jnp.asarray(lanes))
    dm = cdist(centroids, lanes[:, :2])
    idx = dm.argmin(axis=1)
    np.testing.assert_array_equal(np.asarray(yaws), lanes[idx, 2])
    np.testing.assert_allclose(np.asarray(dists), dm.min(axis=1), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(coords), lanes[idx, :2])


def test_nearest_lane_padding():
    centroids = np.zeros((1, 2), np.float32)
    lanes = np.array([[1, 0, 0.5], [99, 99, 0.9]], np.float32)
    lanes_padded = np.concatenate([lanes, np.zeros((8, 3), np.float32)], 0)
    valid = np.array([True, True] + [False] * 8)
    yaws, dists, _ = nearest_lane(
        jnp.asarray(centroids), jnp.asarray(lanes_padded), jnp.asarray(valid)
    )
    assert float(yaws[0]) == 0.5
    np.testing.assert_allclose(float(dists[0]), 1.0, rtol=1e-6)


@pytest.mark.slow
def test_polygon_nms_rotated_overlap():
    import jax.numpy as jnp
    from cm3d_tpu.ops.nms import polygon_nms_keep

    boxes = jnp.asarray(np.array(
        [
            [0.0, 0.0, 2.0, 4.0, 0.0],
            [0.2, 0.0, 2.0, 4.0, 0.1],   # heavy overlap with 0 -> suppressed
            # crossed 90deg: inter = 2x2 = 4 covers 0.5 of the candidate's
            # own area (> 0.4) -> suppressed under the reference's
            # inter/area[candidate] criterion even though IoU is only 1/3
            [0.0, 0.0, 2.0, 4.0, 1.57],
            [20.0, 20.0, 2.0, 4.0, 0.5],
            [40.0, 40.0, 2.0, 4.0, 0.0],  # isolated but score <= 0.3: dropped
        ],
        np.float32,
    ))
    scores = jnp.asarray(np.array([0.9, 0.8, 0.7, 0.6, 0.2], np.float32))
    keep = np.asarray(polygon_nms_keep(boxes, scores, jnp.ones(5, bool)))
    assert list(keep) == [True, False, False, True, False]
    # a small box INSIDE a big kept one: IoU tiny but inter/own-area = 1
    boxes2 = jnp.asarray(np.array(
        [[0.0, 0.0, 10.0, 10.0, 0.0], [1.0, 1.0, 1.0, 1.0, 0.3]],
        np.float32,
    ))
    keep2 = np.asarray(polygon_nms_keep(
        boxes2, jnp.asarray([0.9, 0.8]), jnp.ones(2, bool)
    ))
    assert list(keep2) == [True, False]


def test_nms2d_suppression_chain_exact():
    """Adversarial case for the fixpoint formulation: a long chain where box
    i overlaps only box i+1 (alternating keep pattern requires chain-depth
    sweeps to converge). Greedy keeps the even-indexed boxes."""
    n = 64
    # unit boxes sliding right by 0.1: IoU(i, i+1) = 0.9/1.1 > 0.75,
    # IoU(i, i+2) = 0.8/1.2 < 0.75
    x0 = np.arange(n, dtype=np.float32) * 0.1
    boxes = np.stack([x0, np.zeros(n, np.float32), x0 + 1, np.ones(n, np.float32)], 1)
    scores = np.linspace(1.0, 0.5, n).astype(np.float32)
    labels = np.zeros(n, np.int32)
    keep = np.asarray(
        nms_2d_classwise(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
            jnp.ones(n, bool), 0.75,
        )
    )
    ref = np.zeros(n, bool)
    ref[nms_oracle(boxes, scores, 0.75)] = True
    np.testing.assert_array_equal(keep, ref)
    assert keep[::2].all() and not keep[1::2].any()
