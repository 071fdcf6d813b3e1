"""Fusion (linear matching + alpha grid) on synthetic CM3D/SAM3D sets."""

import json

import numpy as np
import pytest

from cm3d_tpu.pipelines.fusion import (
    alpha_grid,
    compute_matches,
    merge_for_alpha,
    run_fusion_nuscenes,
    run_fusion_waymo,
    submission_to_7dof,
)

RNG = np.random.default_rng(43)


def _sub_box(token, xy, name="car", score=0.5, size=(2.0, 4.5, 1.6), yaw=0.0):
    return {
        "sample_token": token,
        "translation": [float(xy[0]), float(xy[1]), 1.0],
        "size": list(size),
        "rotation": [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))],
        "velocity": [0, 0],
        "detection_name": name,
        "detection_score": float(score),
        "attribute_name": "vehicle.stopped",
    }


def test_matching_and_merge_semantics():
    pred = {"results": {"t1": [
        _sub_box("t1", (0, 0), score=0.9),
        _sub_box("t1", (30, 30), score=0.4),
    ]}}
    sam = {"results": {"t1": [
        _sub_box("t1", (0.2, 0), score=0.6),   # overlaps pred 0
        _sub_box("t1", (-20, -20), score=0.8),  # unmatched
    ]}}
    pb, ps, pmin, pmax = submission_to_7dof(pred)
    sb, ss, smin, smax = submission_to_7dof(sam)
    pm, sm = compute_matches(pb, sb)
    assert pm["t1"] == [0] and sm["t1"] == [0]

    # alpha low: matched pair keeps the pred box
    merged = merge_for_alpha(0.5, pb, ps, sb, ss, pm, sm)
    boxes = merged["results"]["t1"]
    assert len(boxes) == 3  # pred1 + sam1 + merged pair
    scores = sorted(round(b["detection_score"], 3) for b in boxes)
    assert scores == [0.4, round(0.8 * 0.5, 3), 0.9]

    # alpha high: matched pair takes SAM geometry but PRED's class, score*alpha
    merged2 = merge_for_alpha(2.0, pb, ps, sb, ss, pm, sm)
    pair = [b for b in merged2["results"]["t1"]
            if abs(b["translation"][0] - 0.2) < 1e-6]
    assert len(pair) == 1
    assert pair[0]["detection_score"] == 1.0  # clipped 0.6*2
    assert pair[0]["detection_name"] == "car"

    grid = alpha_grid(pmin, pmax, smin, smax)
    assert grid[0] == pytest.approx(0.4 / 0.8)
    assert grid[-1] < 0.9 / 0.6 + 0.04


def test_run_fusion_nuscenes_improves(tmp_path):
    """SAM3D finds objects CM3D missed: fused mAP should beat pred-only."""
    tokens = [f"t{i}" for i in range(3)]
    gt_boxes, egos = {}, {}
    pred_res, sam_res = {}, {}
    for t in tokens:
        egos[t] = [0.0, 0.0, 0.0]
        gt_boxes[t], pred_res[t], sam_res[t] = [], [], []
        for j in range(6):
            xy = RNG.uniform(-30, 30, 2)
            b = _sub_box(t, xy, score=-1.0)
            b["num_pts"] = 10
            gt_boxes[t].append(b)
            if j < 3:  # CM3D detects first half
                pb = _sub_box(t, xy + RNG.normal(0, 0.2, 2),
                              score=RNG.uniform(0.5, 0.9))
                pred_res[t].append(pb)
            else:  # SAM3D detects the rest, low scores
                sb = _sub_box(t, xy + RNG.normal(0, 0.2, 2),
                              score=RNG.uniform(0.05, 0.1))
                sam_res[t].append(sb)

    pred_path = tmp_path / "pred.json"
    sam_path = tmp_path / "sam.json"
    gt_path = tmp_path / "gt.json"
    json.dump({"meta": {}, "results": pred_res}, open(pred_path, "w"))
    json.dump({"meta": {}, "results": sam_res}, open(sam_path, "w"))
    json.dump({"ego_translations": egos, "boxes": gt_boxes}, open(gt_path, "w"))

    best_alpha, best_score = run_fusion_nuscenes(
        str(pred_path), str(sam_path), str(gt_path),
        str(tmp_path / "fused.json"), verbose=False,
    )
    # pred-only car AP ~0.5 recall; fusion adds the rest
    from cm3d_tpu.eval import DETECTION_CVPR_2019
    from cm3d_tpu.eval.boxes import EvalBoxes
    from cm3d_tpu.eval.evaluate import evaluate_boxes

    gt_eb = EvalBoxes.deserialize(gt_boxes)
    from cm3d_tpu.eval.boxes import add_center_dist_from_poses

    add_center_dist_from_poses(gt_eb, egos)
    pred_eb = EvalBoxes.deserialize(pred_res)
    add_center_dist_from_poses(pred_eb, egos)
    m, _, _ = evaluate_boxes(gt_eb, pred_eb, DETECTION_CVPR_2019)
    pred_only = m.mean_ap
    assert best_score > pred_only + 0.01, (best_score, pred_only)
    fused = json.load(open(tmp_path / "fused.json"))
    assert sum(len(v) for v in fused["results"].values()) == 18


def test_run_fusion_waymo(tmp_path):
    from cm3d_tpu.datasets.waymo.proto import (
        LABEL_TYPE_VEHICLE, WaymoBox, WaymoObject, encode_objects,
    )

    def obj(xy, score, ts):
        return WaymoObject(
            box=WaymoBox(float(xy[0]), float(xy[1]), 1.0, 2.0, 4.5, 1.6, 0.0),
            type=LABEL_TYPE_VEHICLE, score=score,
            frame_timestamp_micros=ts, context_name="c", id="x",
            num_lidar_points_in_box=20,
        )

    gts, preds, sams = [], [], []
    for ts in range(3):
        for j in range(4):
            xy = RNG.uniform(-30, 30, 2)
            g = obj(xy, 0.5, ts)
            gts.append(g)
            if j < 2:
                preds.append(obj(xy + RNG.normal(0, 0.1, 2),
                                 float(RNG.uniform(0.5, 0.9)), ts))
            else:
                sams.append(obj(xy + RNG.normal(0, 0.1, 2),
                                float(RNG.uniform(0.05, 0.1)), ts))
    (tmp_path / "gt.bin").write_bytes(encode_objects(gts))
    (tmp_path / "pred.bin").write_bytes(encode_objects(preds))
    (tmp_path / "sam.bin").write_bytes(encode_objects(sams))
    best_alpha, best_score = run_fusion_waymo(
        str(tmp_path / "pred.bin"), str(tmp_path / "sam.bin"),
        str(tmp_path / "gt.bin"), str(tmp_path / "fused.bin"), verbose=False,
    )
    assert best_score > 0.30  # vehicle mAP ~1.0 / 3 classes (only vehicles exist)
    assert (tmp_path / "fused.bin").stat().st_size > 0

    # original object ids survive the merge (reference carries supp[2]
    # back onto every output object)
    from cm3d_tpu.datasets.waymo.proto import decode_objects

    fused = decode_objects((tmp_path / "fused.bin").read_bytes())
    assert fused and all(o.id == "x" for o in fused)


def test_size_round_trips_and_zero_min_semantics():
    """Review fixes pinned: (a) the fused submission restores the original
    [w, l, h] order (the in-conversion slot swap is a MATCHER quirk, not an
    output transform — reference :164-172 in, :321-324 out); (b) zero
    scores pin the PRED min (reference :224-228 updates unconditionally)
    but are excluded from the SAM3D min (:186-189)."""
    pred = {"results": {"t1": [
        _sub_box("t1", (0, 0), score=0.9, size=(2.0, 4.5, 1.6)),
        _sub_box("t1", (40, 40), score=0.0),
    ]}}
    sam = {"results": {"t1": [
        _sub_box("t1", (-20, -20), score=0.0),
        _sub_box("t1", (-30, 30), score=0.8),
    ]}}
    pb, ps, pmin, pmax = submission_to_7dof(pred)
    sb, ss, smin, smax = submission_to_7dof(sam, exclude_zero_min=True)
    assert pmin == 0.0          # pred zero participates
    assert smin == 0.8          # sam3d zero omitted
    pm, sm = compute_matches(pb, sb)
    merged = merge_for_alpha(0.5, pb, ps, sb, ss, pm, sm)
    for b in merged["results"]["t1"]:
        assert b["size"] == [2.0, 4.5, 1.6]  # w/l NOT transposed


def test_alpha_grid_waymo_quirks():
    """waymo/linear_matching.py:317-325: stop extended by one step, list
    reversed, three largest alphas dropped."""
    from cm3d_tpu.pipelines.fusion import alpha_grid_waymo

    got = alpha_grid_waymo(0.1, 0.9, 1.0, 1.0, step=0.04)
    ref = list(np.arange(0.1 / 1.0, 0.9 / 1.0 + 0.04, 0.04))[::-1][3:]
    np.testing.assert_allclose(got, ref)
    assert got[0] > got[-1]  # descending
    full = np.arange(0.1, 0.9 + 0.04, 0.04)
    assert len(got) == len(full) - 3


def test_alpha_grid_rejects_degenerate_extrema():
    """All-zero SAM3D scores (sam_max=0 under exclude_zero_min) or empty
    submissions (1e7/-1e7 sentinels) must fail with the diagnostic, not a
    ZeroDivisionError or a meaningless one-point grid (review finding,
    session 11)."""
    import pytest

    from cm3d_tpu.pipelines.fusion import alpha_grid, alpha_grid_waymo

    with pytest.raises(SystemExit, match="degenerate"):
        alpha_grid(0.1, 0.9, 1e7, 0.0)     # all-zero sam3d scores
    with pytest.raises(SystemExit, match="degenerate"):
        alpha_grid(0.1, 0.9, 1e7, -1e7)    # empty sam3d submission
    with pytest.raises(SystemExit, match="degenerate"):
        alpha_grid_waymo(1e7, -1e7, 0.2, 0.9)  # empty pred submission
    assert alpha_grid(0.1, 0.9, 0.2, 0.9)  # healthy extrema still work
