"""Randomized fuzz of eval accumulate/calc_ap/calc_tp vs a literal oracle.

The oracle below is an independent, devkit-style transcription of the
reference's accumulate_with_recall / accumulate_object_class
(/root/reference/src/nuscenes/eval_custom.py:709-863 and the devkit
accumulate they restate): greedy matching expressed by REMOVING matched GTs
from per-sample candidate lists (vs the implementation's `taken` set), and
curve building written as the devkit does it. Scores are quantized to a
coarse grid so confidence ties (and the reference's descending-original-
index tie-break, eval_custom.py:749) are exercised on every seed.
"""

from __future__ import annotations

import numpy as np
import pytest

from cm3d_tpu.eval.algo import (
    NELEM,
    accumulate,
    attr_acc,
    calc_ap,
    calc_tp,
    center_distance,
    cummean,
    scale_iou,
    velocity_l2,
    yaw_diff,
)
from cm3d_tpu.eval.boxes import DetectionBox, EvalBoxes

CLASSES = ["car", "pedestrian", "traffic_cone", "barrier"]
ATTRS = {
    "car": ["vehicle.moving", "vehicle.parked"],
    "pedestrian": ["pedestrian.moving", "pedestrian.standing"],
    "traffic_cone": [""],
    "barrier": [""],
}


def _random_box(rng, token, name, score):
    yaw = rng.uniform(-np.pi, np.pi)
    return DetectionBox(
        sample_token=token,
        translation=(rng.uniform(-20, 20), rng.uniform(-20, 20), rng.uniform(-2, 2)),
        size=tuple(rng.uniform(0.3, 5.0, size=3)),
        rotation=(np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)),
        velocity=tuple(rng.uniform(-3, 3, size=2)),
        detection_name=name,
        detection_score=score,
        attribute_name=rng.choice(ATTRS[name]),
    )


def _random_scene(rng, n_samples=4, max_gt=6, max_pred=8):
    gt, pred = EvalBoxes(), EvalBoxes()
    for s in range(n_samples):
        token = f"s{s}"
        gts = []
        for _ in range(rng.integers(0, max_gt + 1)):
            gts.append(_random_box(rng, token, rng.choice(CLASSES), -1.0))
        preds = []
        for _ in range(rng.integers(0, max_pred + 1)):
            name = rng.choice(CLASSES)
            # Coarse score grid -> frequent confidence ties.
            score = round(float(rng.uniform(0, 1)), 1)
            if gts and rng.uniform() < 0.6:
                # Perturb a GT so matches actually occur at the dist_th.
                base = gts[rng.integers(0, len(gts))]
                b = _random_box(rng, token, name, score)
                off = rng.uniform(-3, 3, size=2)
                b.translation = (
                    base.translation[0] + off[0],
                    base.translation[1] + off[1],
                    base.translation[2],
                )
                if rng.uniform() < 0.7:
                    b.detection_name = base.detection_name
                preds.append(b)
            else:
                preds.append(_random_box(rng, token, name, score))
        gt.add_boxes(token, gts)
        pred.add_boxes(token, preds)
    return gt, pred


# ---------------------------------------------------------------------------
# Oracle: literal devkit-style transcription.
# ---------------------------------------------------------------------------

def _oracle_accumulate(gt_boxes, pred_boxes, class_name, dist_th):
    object_mode = class_name is None
    if object_mode:
        npos = len([1 for _ in gt_boxes.all])
    else:
        npos = len([1 for g in gt_boxes.all if g.detection_name == class_name])
    if npos == 0:
        from cm3d_tpu.eval.algo import MetricData

        return 0.0, MetricData.no_predictions()

    if object_mode:
        pred_list = [b for b in pred_boxes.all]
    else:
        pred_list = [b for b in pred_boxes.all if b.detection_name == class_name]
    pred_confs = [b.detection_score for b in pred_list]
    sortind = [i for (v, i) in sorted((v, i) for (i, v) in enumerate(pred_confs))][::-1]

    # Candidate GTs per sample, as (original_index, box) pairs; matching
    # REMOVES the matched pair (different mechanism than the impl's set).
    candidates = {}
    for token in gt_boxes.sample_tokens:
        candidates[token] = [
            (i, g)
            for i, g in enumerate(gt_boxes[token])
            if object_mode or g.detection_name == class_name
        ]

    tp, fp, conf = [], [], []
    match_data = {k: [] for k in (
        "trans_err", "vel_err", "scale_err", "orient_err", "attr_err", "conf")}

    for ind in sortind:
        pred = pred_list[ind]
        cands = candidates.get(pred.sample_token, [])
        best = None
        best_d = np.inf
        for pos, (gi, g) in enumerate(cands):
            d = center_distance(g, pred)
            if d < best_d:
                best_d = d
                best = pos
        is_match = best_d < dist_th
        if is_match:
            _, gt = cands.pop(best)
            tp.append(1)
            fp.append(0)
            conf.append(pred.detection_score)
            gname = gt.detection_name
            match_data["trans_err"].append(center_distance(gt, pred))
            if object_mode:
                match_data["vel_err"].append(
                    np.nan if gname in ("traffic_cone", "barrier")
                    else velocity_l2(gt, pred))
                match_data["orient_err"].append(
                    np.nan if gname == "traffic_cone"
                    else yaw_diff(gt, pred, period=np.pi))
                match_data["attr_err"].append(
                    np.nan if gname in ("barrier", "traffic_cone")
                    else 1 - attr_acc(gt, pred))
            else:
                match_data["vel_err"].append(velocity_l2(gt, pred))
                match_data["orient_err"].append(yaw_diff(
                    gt, pred,
                    period=np.pi if class_name == "barrier" else 2 * np.pi))
                match_data["attr_err"].append(1 - attr_acc(gt, pred))
            match_data["scale_err"].append(1 - scale_iou(gt, pred))
            match_data["conf"].append(pred.detection_score)
        else:
            tp.append(0)
            fp.append(1)
            conf.append(pred.detection_score)

    if len(match_data["trans_err"]) == 0:
        from cm3d_tpu.eval.algo import MetricData

        return 0.0, MetricData.no_predictions()

    tp = np.cumsum(tp).astype(float)
    fp = np.cumsum(fp).astype(float)
    conf = np.array(conf)

    prec = tp / (fp + tp)
    rec = tp / float(npos)
    rec_actual = float(np.max(rec))

    rec_interp = np.linspace(0, 1, NELEM)
    prec = np.interp(rec_interp, rec, prec, right=0)
    conf = np.interp(rec_interp, rec, conf, right=0)

    from cm3d_tpu.eval.algo import MetricData

    out = {}
    for key in ("trans_err", "vel_err", "scale_err", "orient_err", "attr_err"):
        tmp = cummean(np.array(match_data[key]))
        out[key] = np.interp(
            conf[::-1], np.array(match_data["conf"])[::-1], tmp[::-1])[::-1]

    return rec_actual, MetricData(
        recall=rec_interp, precision=prec, confidence=conf, **out)


def _oracle_calc_ap(md, min_recall, min_precision):
    prec = np.copy(md.precision)
    prec = prec[round(100 * min_recall) + 1:]
    prec -= min_precision
    prec[prec < 0] = 0
    return float(np.mean(prec)) / (1.0 - min_precision)


FIELDS = ("precision", "confidence", "trans_err", "vel_err", "scale_err",
          "orient_err", "attr_err")


@pytest.mark.parametrize("seed", range(8))
def test_accumulate_matches_oracle_classwise(seed):
    rng = np.random.default_rng(1000 + seed)
    gt, pred = _random_scene(rng)
    for class_name in CLASSES:
        for dist_th in (0.5, 2.0, 4.0):
            ra, md = accumulate(gt, pred, class_name, dist_th)
            ra_o, md_o = _oracle_accumulate(gt, pred, class_name, dist_th)
            assert ra == pytest.approx(ra_o, abs=0), (class_name, dist_th)
            for f in FIELDS:
                np.testing.assert_array_equal(
                    getattr(md, f), getattr(md_o, f),
                    err_msg=f"{class_name}/{dist_th}/{f}")
            # AP/TP downstream agree too.
            assert calc_ap(md, 0.1, 0.1) == pytest.approx(
                _oracle_calc_ap(md_o, 0.1, 0.1))
            for m in ("trans_err", "scale_err", "orient_err"):
                assert calc_tp(md, 0.1, m) == pytest.approx(
                    float(np.mean(getattr(md_o, m)[11:md_o.max_recall_ind + 1]))
                    if md_o.max_recall_ind >= 11 else 1.0), (class_name, m)


@pytest.mark.parametrize("seed", range(8))
def test_accumulate_matches_oracle_object_mode(seed):
    rng = np.random.default_rng(2000 + seed)
    gt, pred = _random_scene(rng)
    for dist_th in (0.5, 2.0):
        ra, md = accumulate(gt, pred, None, dist_th)
        ra_o, md_o = _oracle_accumulate(gt, pred, None, dist_th)
        assert ra == pytest.approx(ra_o, abs=0)
        for f in FIELDS:
            np.testing.assert_array_equal(
                getattr(md, f), getattr(md_o, f), err_msg=f"object/{dist_th}/{f}")


def test_tie_heavy_scores_still_match_oracle():
    """All-equal confidences: ordering is purely the index tie-break."""
    rng = np.random.default_rng(7)
    gt, pred = _random_scene(rng, n_samples=2, max_gt=5, max_pred=10)
    for token in pred.sample_tokens:
        for b in pred[token]:
            b.detection_score = 0.5
    ra, md = accumulate(gt, pred, "car", 2.0)
    ra_o, md_o = _oracle_accumulate(gt, pred, "car", 2.0)
    assert ra == pytest.approx(ra_o, abs=0)
    for f in FIELDS:
        np.testing.assert_array_equal(getattr(md, f), getattr(md_o, f))
