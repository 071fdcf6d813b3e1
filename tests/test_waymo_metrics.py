"""Native Waymo metrics: IoU geometry, Hungarian matcher, metrics binary."""

import numpy as np
import pytest

from cm3d_tpu.datasets.waymo.proto import (
    LABEL_TYPE_CYCLIST,
    LABEL_TYPE_PEDESTRIAN,
    LABEL_TYPE_VEHICLE,
    WaymoBox,
    WaymoObject,
    encode_objects,
)
from cm3d_tpu.eval.waymo_metrics import (
    box_iou_7dof,
    hungarian_match,
    metrics_binary_path,
    run_detection_metrics,
)


def _box7(cx, cy, cz, w, l, h, yaw):
    return np.array([cx, cy, cz, w, l, h, yaw], np.float64)


def test_native_builds():
    assert metrics_binary_path() is not None


def test_iou_axis_aligned():
    a = _box7(0, 0, 0, 2, 4, 2, 0)
    b = _box7(0, 1, 0, 2, 4, 2, 0)  # shifted 1m across width (w=2)
    # bev inter = 4 * 1 = 4; union = 8 + 8 - 4 = 12
    assert abs(box_iou_7dof(a, b, mode_2d=True) - 4 / 12) < 1e-9
    # 3d: z overlap full (2) -> inter 8, union 16+16-8=24
    assert abs(box_iou_7dof(a, b) - 8 / 24) < 1e-9
    # z-disjoint
    c = _box7(0, 1, 5, 2, 4, 2, 0)
    assert box_iou_7dof(a, c) == 0.0


def test_iou_rotated_90deg():
    a = _box7(0, 0, 0, 2, 4, 2, 0)
    b = _box7(0, 0, 0, 2, 4, 2, np.pi / 2)
    # two 2x4 rects crossed at 90deg: intersection 2x2=4, union 8+8-4=12
    assert abs(box_iou_7dof(a, b, mode_2d=True) - 4 / 12) < 1e-6
    # identical boxes
    assert abs(box_iou_7dof(a, a) - 1.0) < 1e-9


def test_iou_matches_jax_geometry():
    rng = np.random.default_rng(5)
    import jax.numpy as jnp

    from cm3d_tpu.geometry.boxes import rotated_iou_bev

    for _ in range(20):
        a = _box7(*rng.uniform(-3, 3, 2), 0, *rng.uniform(1, 4, 2), 2,
                  rng.uniform(-np.pi, np.pi))
        b = _box7(*rng.uniform(-3, 3, 2), 0, *rng.uniform(1, 4, 2), 2,
                  rng.uniform(-np.pi, np.pi))
        want = float(
            rotated_iou_bev(
                jnp.asarray([[a[0], a[1], a[3], a[4], a[6]]]),
                jnp.asarray([[b[0], b[1], b[3], b[4], b[6]]]),
            )[0, 0]
        )
        got = box_iou_7dof(a, b, mode_2d=True)
        assert abs(got - want) < 1e-4, (a, b, got, want)


def test_hungarian_matches_scipy():
    rng = np.random.default_rng(7)
    from scipy.optimize import linear_sum_assignment

    pred = np.stack(
        [_box7(*rng.uniform(-20, 20, 2), 0, 2, 4, 2, rng.uniform(-1, 1))
         for _ in range(12)]
    )
    gt = pred[rng.permutation(12)[:8]].copy()
    gt[:, :2] += rng.normal(0, 0.3, (8, 2))
    pi, gi, io = hungarian_match(pred, gt, iou_thresh=0.3)
    assert len(pi) >= 6
    assert (io >= 0.3).all()
    # optimal total IoU should match scipy's on the gated matrix
    iou = np.zeros((12, 8))
    for i in range(12):
        for j in range(8):
            iou[i, j] = box_iou_7dof(pred[i], gt[j])
    gated = np.where(iou >= 0.3, -iou, 0.0)
    ri, ci = linear_sum_assignment(gated)
    keep = iou[ri, ci] >= 0.3
    assert abs(io.sum() - iou[ri, ci][keep].sum()) < 1e-6


def _obj(box7, typ, score, ts=1, ctx="c", npts=20):
    return WaymoObject(
        box=WaymoBox(*[float(v) for v in box7]),
        type=typ, score=score, frame_timestamp_micros=ts, context_name=ctx,
        num_lidar_points_in_box=npts,
    )


def test_metrics_binary_perfect_predictions(tmp_path):
    rng = np.random.default_rng(9)
    gts, preds = [], []
    for f in range(3):
        for k in range(5):
            b = _box7(*rng.uniform(-30, 30, 2), 1.0, 2, 4.5, 1.8,
                      rng.uniform(-np.pi, np.pi))
            typ = [LABEL_TYPE_VEHICLE, LABEL_TYPE_PEDESTRIAN,
                   LABEL_TYPE_CYCLIST][k % 3]
            gts.append(_obj(b, typ, 0.5, ts=f))
            preds.append(_obj(b, typ, rng.uniform(0.3, 1.0), ts=f))
    (tmp_path / "gt.bin").write_bytes(encode_objects(gts))
    (tmp_path / "pred.bin").write_bytes(encode_objects(preds))
    text, ap = run_detection_metrics(
        str(tmp_path / "pred.bin"), str(tmp_path / "gt.bin")
    )
    assert "OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1" in text
    for key in ["Vehicle/L1 mAP", "Pedestrian/L2 mAPH", "Cyclist/L1 mAP"]:
        assert abs(ap[key] - 1.0) < 1e-6, (key, ap[key], text)
    assert abs(ap["Overall/L2 mAP"] - 1.0) < 1e-6
    # no signs present
    assert ap["Sign/L1 mAP"] == 0.0


def test_metrics_binary_degrades_with_noise(tmp_path):
    rng = np.random.default_rng(11)
    gts, preds = [], []
    for f in range(4):
        for k in range(8):
            b = _box7(*rng.uniform(-40, 40, 2), 1.0, 2, 4.5, 1.8, 0.0)
            gts.append(_obj(b, LABEL_TYPE_VEHICLE, 0.5, ts=f,
                            npts=3 if k < 2 else 30))
            if k < 6:  # detect 6/8, half with noise
                nb = b.copy()
                nb[:2] += rng.normal(0, 0.3, 2)
                nb[6] += rng.normal(0, 0.2)
                preds.append(_obj(nb, LABEL_TYPE_VEHICLE, rng.uniform(0.5, 1), ts=f))
        # false positives
        fb = _box7(*rng.uniform(50, 80, 2), 1.0, 2, 4.5, 1.8, 0.0)
        preds.append(_obj(fb, LABEL_TYPE_VEHICLE, 0.9, ts=f))
    (tmp_path / "gt.bin").write_bytes(encode_objects(gts))
    (tmp_path / "pred.bin").write_bytes(encode_objects(preds))
    _, ap = run_detection_metrics(
        str(tmp_path / "pred.bin"), str(tmp_path / "gt.bin")
    )
    assert 0.05 < ap["Vehicle/L2 mAP"] < 1.0
    # APH <= AP (heading errors discount)
    assert ap["Vehicle/L2 mAPH"] <= ap["Vehicle/L2 mAP"] + 1e-9
    # L1 metric evaluated and distinct from L2 (different GT population)
    assert 0.0 < ap["Vehicle/L1 mAP"] < 1.0
    assert ap["Vehicle/L1 mAP"] != ap["Vehicle/L2 mAP"]


def test_fast_stem_is_distinct_artifact_same_contract(tmp_path):
    """The reference ships TWO ELFs (compute_detection_metrics_{main,fast});
    both stems build here as distinct binaries from the one implementation
    (it IS the fast path) and print byte-identical metrics for the same
    bins — the linear_matching stdout parser works against either."""
    import subprocess

    main_p = metrics_binary_path()
    fast_p = metrics_binary_path(fast=True)
    assert main_p and fast_p and main_p != fast_p
    assert "compute_detection_metrics_fast" in fast_p  # hash-suffixed stem

    rng = np.random.default_rng(4)
    gts, preds = [], []
    for f in range(2):
        for k in range(4):
            b = _box7(*rng.uniform(-30, 30, 2), 1.0, 2, 4.5, 1.8,
                      rng.uniform(-np.pi, np.pi))
            typ = [LABEL_TYPE_VEHICLE, LABEL_TYPE_PEDESTRIAN][k % 2]
            gts.append(_obj(b, typ, 0.5, ts=f))
            bp = np.array(b)
            bp[:2] += rng.normal(0, 0.3, 2)
            preds.append(_obj(tuple(bp), typ, rng.uniform(0.3, 1.0), ts=f))
    (tmp_path / "gt.bin").write_bytes(encode_objects(gts))
    (tmp_path / "pred.bin").write_bytes(encode_objects(preds))
    out_main = subprocess.check_output(
        [main_p, str(tmp_path / "pred.bin"), str(tmp_path / "gt.bin")]
    )
    out_fast = subprocess.check_output(
        [fast_p, str(tmp_path / "pred.bin"), str(tmp_path / "gt.bin")]
    )
    assert out_main == out_fast
    from cm3d_tpu.eval.waymo_metrics import parse_metrics_stdout

    ap = parse_metrics_stdout(out_fast.decode())
    assert 0.0 <= ap["Vehicle/L1 mAP"] <= 1.0
