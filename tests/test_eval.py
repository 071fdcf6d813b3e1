"""Detection eval: hand-computed scenarios + reference quirk coverage."""

import pytest
import numpy as np

from cm3d_tpu.eval import (
    DetectionBox,
    EvalBoxes,
    DETECTION_CVPR_2019,
    RARE_CONFIG,
    accumulate,
    calc_ap,
    calc_tp,
    evaluate_boxes,
)
from cm3d_tpu.eval.algo import (
    angle_diff,
    attr_acc,
    cummean,
    quaternion_yaw,
    scale_iou,
    yaw_diff,
    _conf_sort_indices,
)
from cm3d_tpu.eval.boxes import add_center_dist_from_poses
from cm3d_tpu.eval.evaluate import MapGeometry, filter_eval_boxes, point_in_polygon


def _box(token, xy, name="car", score=-1.0, size=(2.0, 4.0, 1.5), yaw=0.0,
         vel=(0.0, 0.0), attr="", num_pts=-1):
    return DetectionBox(
        sample_token=token,
        translation=(xy[0], xy[1], 1.0),
        size=size,
        rotation=(np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)),
        velocity=vel,
        detection_name=name,
        detection_score=score,
        attribute_name=attr,
        num_pts=num_pts,
    )


def _eval_boxes(boxes):
    eb = EvalBoxes()
    tokens = {}
    for b in boxes:
        tokens.setdefault(b.sample_token, []).append(b)
    for t, bs in tokens.items():
        eb.add_boxes(t, bs)
    return eb


def test_primitives():
    a = _box("s", (0, 0), size=(2, 4, 2))
    b = _box("s", (0, 0), size=(1, 2, 1))
    # intersection 1*2*1=2, union 16+2-2=16
    assert abs(scale_iou(a, b) - 2 / 16) < 1e-9

    assert abs(quaternion_yaw((np.cos(0.4), 0, 0, np.sin(0.4))) - 0.8) < 1e-9
    assert abs(angle_diff(0.1, 2 * np.pi - 0.1, 2 * np.pi) - 0.2) < 1e-9
    g = _box("s", (0, 0), yaw=np.pi - 0.05)
    p = _box("s", (0, 0), yaw=-np.pi + 0.05)
    assert abs(yaw_diff(g, p) - 0.1) < 1e-6

    assert np.isnan(attr_acc(_box("s", (0, 0), attr=""), p))
    assert attr_acc(_box("s", (0, 0), attr="vehicle.stopped"),
                    _box("s", (0, 0), attr="vehicle.stopped")) == 1.0

    x = np.array([1.0, np.nan, 3.0])
    np.testing.assert_allclose(cummean(x), [1.0, 1.0, 2.0])
    np.testing.assert_allclose(cummean(np.array([np.nan, np.nan])), [1.0, 1.0])


def test_conf_sort_tie_break_higher_index_first():
    # reference quirk: ties break toward the higher original index
    assert _conf_sort_indices([0.5, 0.9, 0.5]) == [1, 2, 0]


def test_accumulate_half_recall():
    gt = _eval_boxes([_box("s1", (0, 0)), _box("s1", (50, 50))])
    pred = _eval_boxes([_box("s1", (0.5, 0), score=0.9)])
    rec, md = accumulate(gt, pred, "car", dist_th=2.0)
    assert abs(rec - 0.5) < 1e-9
    # precision 1.0 up to recall 0.5, then 0
    assert md.precision[50] == 1.0 and md.precision[51] == 0.0
    ap = calc_ap(md, 0.1, 0.1)
    # indices 11..100: 40 entries at (1-0.1), 50 at 0 -> mean/0.9
    assert abs(ap - (40 * 0.9 / 90) / 0.9) < 1e-9


def test_accumulate_perfect():
    boxes = [_box("s1", (0, 0), attr="vehicle.stopped"),
             _box("s1", (10, 0), attr="vehicle.stopped"),
             _box("s2", (5, 5), attr="vehicle.stopped")]
    gt = _eval_boxes(boxes)
    pred = _eval_boxes([
        _box(b.sample_token, b.translation[:2], score=0.8, attr="vehicle.stopped")
        for b in boxes
    ])
    rec, md = accumulate(gt, pred, "car", dist_th=0.5)
    assert rec == 1.0
    assert abs(calc_ap(md, 0.1, 0.1) - 1.0) < 1e-9
    assert abs(calc_tp(md, 0.1, "trans_err")) < 1e-9
    assert abs(calc_tp(md, 0.1, "attr_err")) < 1e-9


def test_greedy_matching_takes_closest_untaken():
    # two preds near one gt: high-conf pred takes it, second becomes FP
    gt = _eval_boxes([_box("s1", (0, 0))])
    pred = _eval_boxes([
        _box("s1", (0.2, 0), score=0.9),
        _box("s1", (0.1, 0), score=0.5),
    ])
    rec, md = accumulate(gt, pred, "car", dist_th=2.0)
    assert rec == 1.0
    # precision at max recall: 1 TP then 1 FP -> final precision 0.5
    assert md.precision[100] == 0.0 or md.precision[50] > 0


def test_object_only_matches_across_classes():
    gt = _eval_boxes([_box("s1", (0, 0), name="truck")])
    pred = _eval_boxes([_box("s1", (0.1, 0), name="car", score=0.9)])
    rec_cls, _ = accumulate(gt, pred, "truck", dist_th=2.0)
    assert rec_cls == 0.0  # class mode: no truck preds
    rec_obj, md = accumulate(gt, pred, None, dist_th=2.0)
    assert rec_obj == 1.0  # object mode ignores class


def test_missing_class_no_predictions():
    gt = _eval_boxes([_box("s1", (0, 0), name="car")])
    pred = _eval_boxes([_box("s1", (0, 0), name="car", score=0.5)])
    rec, md = accumulate(gt, pred, "bus", dist_th=2.0)
    assert rec == 0.0
    assert calc_ap(md, 0.1, 0.1) == 0.0
    assert calc_tp(md, 0.1, "trans_err") == 1.0  # last_ind < first_ind


def test_filtering_distance_numpts_and_drivable():
    boxes = [
        _box("s1", (10, 0), num_pts=5),     # keep
        _box("s1", (100, 0), num_pts=5),    # too far (car range 50)
        _box("s1", (5, 0), num_pts=0),      # zero points
    ]
    eb = _eval_boxes(boxes)
    eb = add_center_dist_from_poses(eb, {"s1": (0.0, 0.0, 0.0)})
    out = filter_eval_boxes(eb, DETECTION_CVPR_2019.class_range)
    assert len(out["s1"]) == 1

    # drivable: square [0,20]^2
    geom = MapGeometry([(np.array([[0, 0], [20, 0], [20, 20], [0, 20]]), [])])
    eb2 = _eval_boxes([_box("s1", (10, 10), num_pts=3),
                       _box("s1", (30, 30), num_pts=3)])
    eb2 = add_center_dist_from_poses(eb2, {"s1": (0.0, 0.0, 0.0)})
    out2 = filter_eval_boxes(eb2, DETECTION_CVPR_2019.class_range, map_geometry=geom)
    assert len(out2["s1"]) == 1
    assert out2["s1"][0].translation[0] == 10


def test_point_in_polygon_with_hole():
    ring = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6]], float)
    geom = MapGeometry([(ring, [hole])])
    assert geom.contains(2, 2)
    assert not geom.contains(5, 5)  # inside the hole
    assert not geom.contains(11, 5)
    assert point_in_polygon(5.0, 5.0, ring)


def test_full_eval_and_nds():
    gt = _eval_boxes([
        _box("s1", (0, 0), attr="vehicle.stopped", num_pts=10),
        _box("s1", (10, 0), name="pedestrian", size=(0.5, 0.5, 1.8),
             attr="pedestrian.standing", num_pts=4),
    ])
    pred = _eval_boxes([
        _box("s1", (0.1, 0), score=0.9, attr="vehicle.stopped"),
        _box("s1", (10.1, 0), name="pedestrian", size=(0.5, 0.5, 1.8),
             score=0.8, attr="pedestrian.standing"),
    ])
    metrics, md_list, recalls = evaluate_boxes(gt, pred, DETECTION_CVPR_2019)
    s = metrics.serialize()
    assert abs(s["mean_dist_aps"]["car"] - 1.0) < 1e-9
    assert abs(s["mean_dist_aps"]["pedestrian"] - 1.0) < 1e-9
    # 8 absent classes contribute 0 AP
    assert abs(s["mean_ap"] - 2 / 10) < 1e-9
    assert 0 < s["nd_score"] < 1
    # trans err ~0.1 for both matched classes
    assert abs(s["label_tp_errors"]["car"]["trans_err"] - 0.1) < 1e-6

    # rare config has 12 classes
    m2, _, _ = evaluate_boxes(gt, pred, RARE_CONFIG)
    assert len(m2.serialize()["mean_dist_aps"]) == 12


def test_object_only_eval():
    gt = _eval_boxes([_box("s1", (0, 0), name="truck", num_pts=5)])
    pred = _eval_boxes([_box("s1", (0.1, 0), name="car", score=0.9)])
    metrics, _, recalls = evaluate_boxes(gt, pred, DETECTION_CVPR_2019,
                                         object_only=True)
    s = metrics.serialize()
    assert list(s["mean_dist_aps"].keys()) == ["object"]
    assert s["mean_dist_aps"]["object"] > 0.8
    assert recalls[0] == 1.0


@pytest.mark.slow
def test_render_curves_writes_reference_plot_layout(tmp_path):
    """DetectionEval.main(render_curves=True) writes the reference's plots
    dir: summary.pdf + {class}_pr/_tp.pdf + dist_pr_{th}.pdf
    (eval_custom.py:1045-1068)."""
    from cm3d_tpu.eval.evaluate import DetectionEval

    gt = _eval_boxes([
        _box("s1", (0, 0), attr="vehicle.stopped", num_pts=10),
        _box("s1", (10, 0), name="pedestrian", size=(0.5, 0.5, 1.8),
             attr="pedestrian.standing", num_pts=4),
    ])
    pred = _eval_boxes([
        _box("s1", (0.1, 0), score=0.9, attr="vehicle.stopped"),
        _box("s1", (10.1, 0), name="pedestrian", size=(0.5, 0.5, 1.8),
             score=0.8, attr="pedestrian.standing"),
    ])
    ev = DetectionEval(
        gt_boxes=gt, pred_boxes=pred, cfg=DETECTION_CVPR_2019,
        ego_translations={"s1": (0.0, 0.0, 0.0)},
        output_dir=str(tmp_path), verbose=False,
    )
    ev.main(render_curves=True)
    plots = tmp_path / "plots"
    expected = ["summary.pdf"]
    for name in DETECTION_CVPR_2019.class_names:
        expected += [f"{name}_pr.pdf", f"{name}_tp.pdf"]
    for th in DETECTION_CVPR_2019.dist_ths:
        expected.append(f"dist_pr_{th}.pdf")
    for fn in expected:
        p = plots / fn
        assert p.exists() and p.stat().st_size > 500, fn
    # and the non-render path still writes the summary json
    assert (tmp_path / "metrics_summary.json").exists()


def test_plot_examples_writes_fixed_subset(tmp_path):
    """DetectionEval.main(plot_examples=N) writes N example BEV pngs under
    {output_dir}/examples with the reference's fixed random subset
    (eval_custom.py:1080-1097, seed 42)."""
    from cm3d_tpu.eval.evaluate import DetectionEval

    gt = _eval_boxes([
        _box("s1", (0, 0), attr="vehicle.stopped", num_pts=10),
        _box("s2", (5, 5), attr="vehicle.stopped", num_pts=10),
        _box("s3", (9, -4), attr="vehicle.stopped", num_pts=10),
    ])
    pred = _eval_boxes([
        _box("s1", (0.1, 0), score=0.9, attr="vehicle.stopped"),
        _box("s2", (5.2, 5), score=0.05, attr="vehicle.stopped"),  # < conf_th
        _box("s3", (9, -4.1), score=0.7, attr="vehicle.stopped"),
    ])
    egos = {t: (0.0, 0.0, 0.0) for t in ("s1", "s2", "s3")}
    seen = []

    def provider(token):
        seen.append(token)
        return np.array([[1.0, 2.0], [3.0, -4.0]])

    ev = DetectionEval(
        gt_boxes=gt, pred_boxes=pred, cfg=DETECTION_CVPR_2019,
        ego_translations=egos, output_dir=str(tmp_path), verbose=False,
    )
    ev.main(plot_examples=2, points_provider=provider)
    pngs = sorted(p.name for p in (tmp_path / "examples").glob("*.png"))
    assert len(pngs) == 2
    assert len(seen) == 2
    for p in pngs:
        assert (tmp_path / "examples" / p).stat().st_size > 1000


def test_gt_json_plot_examples_stays_hermetic(tmp_path):
    """--gt_json + --plot_examples must render boxes-only examples without
    touching the dataroot even when one is (habitually) passed — fabricated
    GT tokens have no tables behind them, so loading them must not be
    attempted (a bogus dataroot would raise FileNotFoundError)."""
    import json
    import os

    from cm3d_tpu.eval.__main__ import main as eval_main

    gt = _eval_boxes([_box("tok0", (1.0, 1.0)), _box("tok1", (-3.0, 2.0))])
    pred = _eval_boxes([_box("tok0", (1.2, 1.0), score=0.9),
                        _box("tok1", (-3.0, 2.1), score=0.8)])
    (tmp_path / "gt.json").write_text(json.dumps({
        "ego_translations": {"tok0": [0, 0, 0], "tok1": [0, 0, 0]},
        "boxes": gt.serialize(),
    }))
    (tmp_path / "pred.json").write_text(json.dumps({
        "meta": {"use_camera": True}, "results": {
            t: [b.serialize() for b in pred[t]] for t in pred.sample_tokens},
    }))
    summary = eval_main([
        str(tmp_path / "pred.json"), "--gt_json", str(tmp_path / "gt.json"),
        "--output_dir", str(tmp_path / "m"), "--verbose", "0",
        "--plot_examples", "2", "--dataroot", "/nonexistent/nuscenes",
    ])
    assert summary["mean_ap"] > 0.0
    examples = os.listdir(tmp_path / "m" / "examples")
    assert len(examples) == 2


def test_reference_config_min_recall_precision_zero():
    """cfg/rare_config.json:18-19 and sam3d_config.json:16-17 set
    min_recall = min_precision = 0 — unlike cvpr_2019's 0.1/0.1 — which
    changes calc_ap (no index-10 cut, no rescale) and calc_tp (averaging
    starts at the first bin)."""
    from cm3d_tpu.eval import SAM3D_CONFIG
    from cm3d_tpu.eval.algo import MetricData, calc_ap

    assert (RARE_CONFIG.min_recall, RARE_CONFIG.min_precision) == (0.0, 0.0)
    assert (SAM3D_CONFIG.min_recall, SAM3D_CONFIG.min_precision) == (0.0, 0.0)
    assert (DETECTION_CVPR_2019.min_recall,
            DETECTION_CVPR_2019.min_precision) == (0.1, 0.1)

    md = MetricData.no_predictions()
    md.precision = np.linspace(1.0, 0.0, 101)
    ap_ref = calc_ap(md, 0.0, 0.0)      # mean of precision[1:]
    ap_cvpr = calc_ap(md, 0.1, 0.1)     # cut at 11, -0.1, /0.9
    np.testing.assert_allclose(ap_ref, np.mean(md.precision[1:]))
    exp = np.clip(md.precision[11:] - 0.1, 0, None).mean() / 0.9
    np.testing.assert_allclose(ap_cvpr, exp)
    assert ap_ref != ap_cvpr


def test_eval_cli_loud_errors_and_extra_token_message(tmp_path):
    """(a) --gt_json + --drivable_filtering is a loud SystemExit (hermetic
    mode has no map tables; silently skipping the filter produced wrong
    numbers); (b) a prediction token missing from ego_translations is a
    loud SystemExit naming the token; (c) the library-level pose lookup
    raises a descriptive KeyError, never a bare token."""
    import json

    import pytest

    from cm3d_tpu.eval.__main__ import main as eval_main
    from cm3d_tpu.eval.boxes import add_center_dist_from_poses

    gt = _eval_boxes([_box("tok0", (1.0, 1.0))])
    pred = _eval_boxes([_box("tok0", (1.2, 1.0), score=0.9),
                        _box("tok9", (5.0, 5.0), score=0.8)])
    (tmp_path / "gt.json").write_text(json.dumps({
        "ego_translations": {"tok0": [0, 0, 0]},
        "boxes": gt.serialize(),
    }))
    (tmp_path / "pred.json").write_text(json.dumps({
        "meta": {}, "results": {
            t: [b.serialize() for b in pred[t]] for t in pred.sample_tokens},
    }))
    with pytest.raises(SystemExit, match="drivable_filtering"):
        eval_main([
            str(tmp_path / "pred.json"), "--gt_json",
            str(tmp_path / "gt.json"), "--output_dir", str(tmp_path / "m"),
            "--verbose", "0", "--drivable_filtering", "1",
        ])
    with pytest.raises(SystemExit, match="tok9"):
        eval_main([
            str(tmp_path / "pred.json"), "--gt_json",
            str(tmp_path / "gt.json"), "--output_dir", str(tmp_path / "m"),
            "--verbose", "0",
        ])
    with pytest.raises(KeyError, match="ego pose for sample 'tok9'"):
        add_center_dist_from_poses(pred, {"tok0": (0, 0, 0)})
