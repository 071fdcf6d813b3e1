"""KITTI AP|R40 evaluator (eval/kitti.py) — devkit-protocol semantics.

Hand-computed AP pins (threshold quantization, FP curves), rotated-IoU parity
against the JAX clipper AND the native C box_iou_7dof, neighbor-class /
DontCare / difficulty gating, and the CLI loop over real label files."""

import numpy as np
import pytest

from cm3d_tpu.datasets.kitti.calib import Object3d, write_label
from cm3d_tpu.eval.kitti import (
    DIFFICULTIES,
    N_SAMPLE_PTS,
    box_overlap_3d,
    eval_class,
    evaluate_kitti,
    get_thresholds,
    image_box_overlap,
    load_frames,
    main as kitti_eval_main,
    rotated_iou_bev_np,
)


def make_obj(
    cls="Car",
    x=0.0,
    z=20.0,
    y=1.5,
    w=1.8,
    l=4.0,
    h=1.6,
    ry=0.0,
    score=float("nan"),
    occ=0,
    trunc=0.0,
    bbox=(100.0, 100.0, 180.0, 150.0),
    alpha=0.0,
):
    return Object3d(
        type=cls,
        truncation=trunc,
        occlusion=occ,
        alpha=alpha,
        box2d=np.array(bbox, np.float64),
        h=h,
        w=w,
        l=l,
        t=(x, y, z),
        ry=ry,
        score=score,
    )


# ---------------------------------------------------------------------------
# IoU parity and hand values
# ---------------------------------------------------------------------------


def test_rotated_iou_np_matches_jax_and_native():
    import jax

    from cm3d_tpu.geometry.boxes import rotated_iou_bev

    rng = np.random.default_rng(0)
    n, m = 7, 9
    boxes_a = np.column_stack(
        [
            rng.uniform(-10, 10, n),
            rng.uniform(-10, 10, n),
            rng.uniform(0.5, 3.0, n),
            rng.uniform(0.5, 6.0, n),
            rng.uniform(-np.pi, np.pi, n),
        ]
    )
    boxes_b = np.column_stack(
        [
            rng.uniform(-10, 10, m),
            rng.uniform(-10, 10, m),
            rng.uniform(0.5, 3.0, m),
            rng.uniform(0.5, 6.0, m),
            rng.uniform(-np.pi, np.pi, m),
        ]
    )
    got = rotated_iou_bev_np(boxes_a, boxes_b)
    want_jax = np.asarray(
        rotated_iou_bev(
            jax.numpy.asarray(boxes_a), jax.numpy.asarray(boxes_b)
        )
    )
    np.testing.assert_allclose(got, want_jax, atol=1e-5)

    from cm3d_tpu.eval.waymo_metrics import box_iou_7dof

    # native layout: [cx, cy, cz, w(across), l(along), h, heading]
    for i in range(n):
        for j in range(m):
            a7 = np.array(
                [boxes_a[i, 0], boxes_a[i, 1], 0.0, boxes_a[i, 2],
                 boxes_a[i, 3], 1.0, boxes_a[i, 4]]
            )
            b7 = np.array(
                [boxes_b[j, 0], boxes_b[j, 1], 0.0, boxes_b[j, 2],
                 boxes_b[j, 3], 1.0, boxes_b[j, 4]]
            )
            want = box_iou_7dof(a7, b7, mode_2d=True)
            assert abs(got[i, j] - want) < 1e-9


def test_iou_hand_values():
    # identical boxes
    box = np.array([[0.0, 0.0, 2.0, 4.0, 0.3]])
    assert rotated_iou_bev_np(box, box)[0, 0] == pytest.approx(1.0)
    # unit squares offset by half: inter 0.5, union 1.5
    a = np.array([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b = np.array([[0.5, 0.0, 1.0, 1.0, 0.0]])
    assert rotated_iou_bev_np(a, b)[0, 0] == pytest.approx(1.0 / 3.0)
    # 45°-rotated unit square on an identical axis-aligned one:
    # intersection is the regular octagon, area 2*(sqrt(2)-1)
    c = np.array([[0.0, 0.0, 1.0, 1.0, np.pi / 4]])
    inter = 2.0 * (np.sqrt(2.0) - 1.0)
    assert rotated_iou_bev_np(a, c)[0, 0] == pytest.approx(
        inter / (2.0 - inter), abs=1e-6
    )

    # 3D: same footprint, half vertical overlap
    g = [make_obj(y=1.6, h=1.6)]
    d = [make_obj(y=2.4, h=1.6)]  # shifted down 0.8 = h/2
    # inter = A*0.8, union = A*(1.6+1.6-0.8)
    assert box_overlap_3d(d, g)[0, 0] == pytest.approx(0.8 / 2.4)
    # disjoint in y → zero 3D IoU, full BEV IoU
    d2 = [make_obj(y=4.0, h=1.6)]
    assert box_overlap_3d(d2, g)[0, 0] == 0.0


def test_image_box_overlap_criteria():
    det = np.array([[0.0, 0.0, 10.0, 10.0]])
    dc = np.array([[0.0, 0.0, 5.0, 10.0]])
    assert image_box_overlap(det, dc)[0, 0] == pytest.approx(0.5)
    # criterion 0: intersection over DET area
    assert image_box_overlap(det, dc, criterion=0)[0, 0] == pytest.approx(0.5)
    assert image_box_overlap(dc, det, criterion=0)[0, 0] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# Threshold quantization — hand-derived pins
# ---------------------------------------------------------------------------


def test_get_thresholds_dense_and_sparse():
    # 41 distinct scores over 41 GT: recall lags the grid → never skipped
    scores = np.linspace(1.0, 0.6, 41)
    t = get_thresholds(scores, 41)
    assert len(t) == N_SAMPLE_PTS
    # 2 GT: both scores kept, at recall positions 0 and 1/40
    t2 = get_thresholds(np.array([0.9, 0.8]), 2)
    np.testing.assert_allclose(t2, [0.9, 0.8])


def _frames_perfect(n=41, cls="Car"):
    """One frame, n tall easy GT boxes + identical preds, distinct scores."""
    gts, dets = [], []
    for i in range(n):
        kw = dict(
            cls=cls,
            x=4.0 * i,
            bbox=(10.0 * i, 100.0, 10.0 * i + 8.0, 150.0),
        )
        gts.append(make_obj(**kw))
        dets.append(make_obj(score=1.0 - 0.01 * i, **kw))
    return [gts], [dets]


def test_perfect_predictions_ap_one():
    gt, det = _frames_perfect(41)
    res = evaluate_kitti(gt, det)
    for metric in ("bbox", "bev", "3d", "aos"):
        for d in DIFFICULTIES:
            assert res["Car"][metric][d] == pytest.approx(1.0), (metric, d)


def test_two_gt_recall_quantization():
    # 2 GT → thresholds at recall positions 0 and 1/40; position 0 is
    # excluded from AP|R40, so a PERFECT result on 2 GT pins at exactly 1/40.
    gt, det = _frames_perfect(2)
    r = eval_class(gt, det, "Car", 0, "bev", 0.7)
    assert r["n_gt"] == 2
    assert r["ap"] == pytest.approx(1.0 / 40.0)


def test_fp_precision_curve():
    # 41 perfect preds + one far-away high-score FP: at every threshold
    # exactly one FP counts → precision[k] = (k+1)/(k+2) pre-smoothing
    # (already monotonically increasing in k, so smoothing keeps the tail).
    gt, det = _frames_perfect(41)
    det[0].append(
        make_obj(x=-500.0, score=2.0, bbox=(900.0, 100.0, 908.0, 150.0))
    )
    r = eval_class(gt, det, "Car", 0, "bev", 0.7)
    prec = np.array([(k + 1) / (k + 2) for k in range(41)])
    # smoothing = max over suffix = last value of the increasing curve? No:
    # max-from-right of an increasing sequence is its final value at every
    # position... so smoothed precision is flat at 42/43.
    want = np.full(41, 41.0 / 42.0)
    np.testing.assert_allclose(r["precision"], want, atol=1e-9)
    assert r["ap"] == pytest.approx(41.0 / 42.0)
    del prec


def test_neighbor_class_ignored():
    # A det on a Van GT is neither TP nor FP for Car; on a Truck GT it's FP.
    def scenario(other_cls):
        gts = [
            make_obj(),  # real Car
            make_obj(cls=other_cls, x=30.0, bbox=(300, 100, 380, 150)),
        ]
        dets = [
            make_obj(score=0.9),
            # score ABOVE the matched TP: thresholds come from matched
            # scores only ([0.9]), so a lower-scored extra det would be
            # silently threshold-excluded and never count as FP
            make_obj(x=30.0, score=0.95, bbox=(300, 100, 380, 150)),
        ]
        return eval_class([gts], [dets], "Car", 0, "bev", 0.7)

    ap_van = scenario("Van")["ap"]
    ap_truck = scenario("Truck")["ap"]
    # Van case: clean run, 1 GT, thresholds [0.9] at position 0 → AP 0
    # contribution only from position 0 which is excluded... but smoothing
    # keeps precision[0]=1 and positions >=1 are 0 → AP = 0. Compare FP
    # effect on the precision curve directly instead.
    van = scenario("Van")
    truck = scenario("Truck")
    assert van["precision"][0] == pytest.approx(1.0)
    assert truck["precision"][0] == pytest.approx(0.5)  # 1 TP + 1 FP
    assert ap_van >= ap_truck


def test_dontcare_absorbs_bbox_fp_only():
    gts = [
        make_obj(),
        make_obj(cls="DontCare", bbox=(400.0, 100.0, 500.0, 200.0)),
    ]
    dets = [
        make_obj(score=0.9),
        # extra det fully inside the DontCare region (far in 3D); score
        # above the TP so it survives the threshold cut
        make_obj(x=50.0, score=0.95, bbox=(410.0, 110.0, 480.0, 190.0)),
    ]
    bbox = eval_class([gts], [dets], "Car", 0, "bbox", 0.7)
    bev = eval_class([gts], [dets], "Car", 0, "bev", 0.7)
    assert bbox["precision"][0] == pytest.approx(1.0)  # FP absorbed
    assert bev["precision"][0] == pytest.approx(0.5)  # dc has no 3D extent


def test_difficulty_gating():
    gts = [
        make_obj(),  # easy
        make_obj(x=30.0, occ=2, bbox=(300, 100, 380, 130)),  # hard only
    ]
    dets = [make_obj(score=0.9), make_obj(x=30.0, score=0.95,
                                          bbox=(300, 100, 380, 130))]
    easy = eval_class([gts], [dets], "Car", 0, "bev", 0.7)
    hard = eval_class([gts], [dets], "Car", 2, "bev", 0.7)
    assert easy["n_gt"] == 1 and hard["n_gt"] == 2
    # the det matching the occluded GT is assigned (not FP) at easy
    assert easy["precision"][0] == pytest.approx(1.0)


def test_short_detection_ignored():
    # devkit: dets below MIN_HEIGHT are "ignored" regardless of class —
    # never FPs, may absorb ignored GT.
    gts = [make_obj()]
    dets = [
        make_obj(score=0.9),
        make_obj(x=60.0, score=0.95, bbox=(500, 100, 560, 130)),  # 30px < 40
    ]
    easy = eval_class([gts], [dets], "Car", 0, "bev", 0.7)
    assert easy["precision"][0] == pytest.approx(1.0)
    # at hard (25px) the same det is tall enough → FP
    hard = eval_class([gts], [dets], "Car", 2, "bev", 0.7)
    assert hard["precision"][0] == pytest.approx(0.5)


# ---------------------------------------------------------------------------
# File IO + CLI
# ---------------------------------------------------------------------------


def test_cli_end_to_end(tmp_path, capsys):
    gt_dir = tmp_path / "label_2"
    pred_dir = tmp_path / "pred"
    gt_dir.mkdir()
    pred_dir.mkdir()
    rng = np.random.default_rng(3)
    for f in range(3):
        gts, dets = [], []
        for i in range(14):
            kw = dict(
                x=3.5 * i - 20.0,
                z=15.0 + 2.0 * i,
                bbox=(50.0 * i % 900, 100.0, 50.0 * i % 900 + 45.0, 160.0),
            )
            gts.append(make_obj(**kw))
            dets.append(make_obj(score=float(rng.uniform(0.3, 1.0)), **kw))
        write_label(gt_dir / f"{f:06d}.txt", gts)
        write_label(pred_dir / f"{f:06d}.txt", dets)
    out_json = tmp_path / "res.json"
    res = kitti_eval_main(
        [
            "--gt_dir", str(gt_dir), "--pred_dir", str(pred_dir),
            "--out", str(out_json),
        ]
    )
    printed = capsys.readouterr().out
    assert "Car AP@0.70" in printed and "evaluated 3 frames" in printed
    assert out_json.exists()
    # 42 perfect GT-matching preds across 3 frames → every recall position
    # reachable → AP 1.0 on every metric at every difficulty
    for metric in ("bbox", "bev", "3d"):
        for d in DIFFICULTIES:
            assert res["Car"][metric][d] == pytest.approx(1.0), (metric, d)
    # classes with no GT/preds report zero
    assert res["Pedestrian"]["3d"]["easy"] == 0.0


def test_aos_sentinel_disables_aos():
    # devkit: any detection with the alpha == -10 sentinel (the reference's
    # own txts) means orientation is unavailable — AOS must be skipped, not
    # computed from garbage.
    gt, det = _frames_perfect(41)
    for d in det[0]:
        d.alpha = -10
    res = evaluate_kitti(gt, det)
    assert "aos" not in res["Car"]
    assert res["Car"]["bbox"]["easy"] == pytest.approx(1.0)  # AP unaffected


def test_load_frames_default_ids_from_gt_and_orphan_preds(tmp_path):
    gt_dir = tmp_path / "label_2"
    pred_dir = tmp_path / "pred"
    gt_dir.mkdir()
    pred_dir.mkdir()
    write_label(gt_dir / "000000.txt", [make_obj()])
    write_label(gt_dir / "000001.txt", [make_obj()])
    write_label(pred_dir / "000000.txt", [make_obj(score=0.5)])
    # default ids come from the GT dir: frame 1 (no pred file) must still be
    # evaluated as zero detections (its GT are false negatives)
    gt, det, ids = load_frames(gt_dir, pred_dir)
    assert ids == [0, 1]
    assert len(det[1]) == 0 and len(gt[1]) == 1
    # a pred txt with no GT counterpart = mismatched dirs, fail loud
    write_label(pred_dir / "000005.txt", [make_obj(score=0.5)])
    with pytest.raises(ValueError, match="no GT counterpart"):
        load_frames(gt_dir, pred_dir)


def test_load_frames_missing_pred_and_nan_score(tmp_path):
    gt_dir = tmp_path / "label_2"
    pred_dir = tmp_path / "pred"
    gt_dir.mkdir()
    pred_dir.mkdir()
    write_label(gt_dir / "000000.txt", [make_obj()])
    write_label(gt_dir / "000001.txt", [make_obj()])
    write_label(pred_dir / "000000.txt", [make_obj(score=0.5)])
    gt, det, ids = load_frames(gt_dir, pred_dir, ids=[0, 1])
    assert len(det[1]) == 0  # missing pred file = no detections
    # un-scored predictions (the pseudo/ 15-column format) fail loudly
    write_label(pred_dir / "000001.txt", [make_obj()])
    with pytest.raises(ValueError, match="without a score"):
        load_frames(gt_dir, pred_dir, ids=[0, 1])
