"""Detic detector: proposal decode semantics + tiny end-to-end forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cm3d_tpu.models.detic import (
    DETIC_TEST,
    Detic,
    apply_deltas,
    decode_proposals,
)

RNG = np.random.default_rng(31)


def test_apply_deltas_matches_detectron2_formula():
    boxes = np.array([[10.0, 20.0, 50.0, 60.0]], np.float32)
    deltas = np.array([[1.0, -2.0, 0.5, 0.25]], np.float32)
    w = (10.0, 10.0, 5.0, 5.0)
    got = np.asarray(apply_deltas(jnp.asarray(boxes), jnp.asarray(deltas), w))
    # numpy transcription of Box2BoxTransform.apply_deltas
    bw, bh = 40.0, 40.0
    cx, cy = 30.0, 40.0
    pcx = (1.0 / 10) * bw + cx
    pcy = (-2.0 / 10) * bh + cy
    pw = np.exp(0.5 / 5) * bw
    ph = np.exp(0.25 / 5) * bh
    want = [pcx - pw / 2, pcy - ph / 2, pcx + pw / 2, pcy + ph / 2]
    np.testing.assert_allclose(got[0], want, rtol=1e-6)


def test_decode_proposals_recovers_planted_peak():
    cfg = DETIC_TEST
    h, w = 16, 16
    hm = np.full((1, h, w), -10.0, np.float32)
    hm[0, 5, 7] = 5.0  # strong peak at grid (5, 7)
    reg = np.zeros((1, h, w, 4), np.float32)
    reg[0, 5, 7] = [2.0, 1.0, 2.0, 3.0]  # ltrb in stride units
    hms = {3: jnp.asarray(hm)}
    regs = {3: jnp.asarray(reg)}
    boxes, scores = decode_proposals(hms, regs, {3: 8}, cfg)
    b = np.asarray(boxes[0])
    cx, cy, s = 7 * 8 + 4, 5 * 8 + 4, 8
    np.testing.assert_allclose(b, [cx - 16, cy - 8, cx + 16, cy + 24], atol=1e-4)
    assert float(scores[0]) > 0.99


def test_tiny_detic_forward():
    cfg = DETIC_TEST
    model = Detic(cfg)
    img = jnp.asarray(RNG.random((64, 64, 3)).astype(np.float32))
    k = 5
    clf = RNG.standard_normal((cfg.embed_dim, k)).astype(np.float32)
    clf /= np.linalg.norm(clf, axis=0, keepdims=True)
    params = model.init(jax.random.PRNGKey(0), img, jnp.asarray(clf))["params"]
    det = model.apply({"params": params}, img, jnp.asarray(clf))
    assert det.boxes.shape == (cfg.max_detections, 4)
    assert det.scores.shape == (cfg.max_detections,)
    assert det.classes.shape == (cfg.max_detections,)
    assert np.isfinite(np.asarray(det.boxes)).all()
    # boxes clipped to image
    b = np.asarray(det.boxes)
    assert (b >= -1e-3).all() and (b[:, [0, 2]] <= 64 + 1e-3).all()

    # jits cleanly
    fwd = jax.jit(lambda p, i, c: model.apply({"params": p}, i, c))
    det2 = fwd(params, img, jnp.asarray(clf))
    np.testing.assert_allclose(
        np.asarray(det2.scores), np.asarray(det.scores), atol=1e-5
    )


def test_detic_vocabulary_swap_changes_classes():
    """reset_cls_test analog: a different classifier changes predictions."""
    cfg = DETIC_TEST
    model = Detic(cfg)
    img = jnp.asarray(RNG.random((64, 64, 3)).astype(np.float32))
    clf1 = RNG.standard_normal((cfg.embed_dim, 4)).astype(np.float32)
    clf1 /= np.linalg.norm(clf1, axis=0, keepdims=True)
    params = model.init(jax.random.PRNGKey(1), img, jnp.asarray(clf1))["params"]
    det1 = model.apply({"params": params}, img, jnp.asarray(clf1))
    # K can change without re-init (zero-shot head)
    clf2 = RNG.standard_normal((cfg.embed_dim, 9)).astype(np.float32)
    clf2 /= np.linalg.norm(clf2, axis=0, keepdims=True)
    det2 = model.apply({"params": params}, img, jnp.asarray(clf2))
    assert int(np.asarray(det2.classes).max()) <= 8


def test_select_detections_nms_before_truncation():
    """detectron2 order: NMS over ALL above-threshold pairs, THEN truncate.
    Build max_detections=2 with 3 distinct objects, where a 4th duplicate
    box (high score, overlapping object A) would consume a slot if
    truncation ran first."""
    from cm3d_tpu.models.detic import DeticConfig, select_detections

    cfg = DeticConfig(max_detections=2, nms_topk=16, score_thresh=0.1,
                      nms_thresh=0.5)
    # object A at two near-identical boxes (dup should be NMS'd away),
    # objects B, C distinct
    boxes = jnp.asarray(np.array([
        [0, 0, 10, 10],      # A
        [1, 0, 11, 10],      # A duplicate (IoU ~0.8)
        [50, 50, 60, 60],    # B
        [100, 100, 110, 110],  # C
    ], np.float32))
    scores = jnp.asarray(np.array(
        [[0.9], [0.8], [0.7], [0.6]], np.float32))  # K=1
    det = select_detections(boxes, scores, cfg)
    got = {tuple(np.asarray(det.boxes[i])[:2]) for i in range(2)
           if bool(det.valid[i])}
    # truncate-first would return {A, A-duplicate}; NMS-first returns {A, B}
    assert got == {(0.0, 0.0), (50.0, 50.0)}
    np.testing.assert_allclose(np.asarray(det.scores[:2]), [0.9, 0.7])


def test_mult_proposal_score_is_geometric_mean():
    """Detic's MULT_PROPOSAL_SCORE combines as sqrt(cls * proposal) —
    s*sqrt(ps) would deflate moderate scores below score_thresh."""
    s, ps = 0.1, 0.4
    combined = float(jnp.sqrt(jnp.asarray(s) * jnp.maximum(ps, 0.0)))
    assert abs(combined - 0.2) < 1e-6
    # the Detic forward applies exactly this (pin the code path exists)
    import inspect

    from cm3d_tpu.models import detic as detic_mod

    src = inspect.getsource(detic_mod.Detic.__call__)
    assert "jnp.sqrt(" in src and "prop_scores" in src


def test_detic_pixel_stats_are_rgb():
    """Detic configs set INPUT.FORMAT: RGB with ImageNet-order stats; the
    reference's BGR flip is undone inside DefaultPredictor. Feeding the
    flipped order to a converted checkpoint silently swaps R/B weights."""
    from cm3d_tpu.models.detic import DETIC_PIXEL_MEAN, DETIC_PIXEL_STD

    np.testing.assert_allclose(DETIC_PIXEL_MEAN, [123.675, 116.280, 103.530])
    np.testing.assert_allclose(DETIC_PIXEL_STD, [58.395, 57.120, 57.375])


def test_get_rel_pos_interpolation_matches_torch():
    """Table-length interpolation uses F.interpolate(mode='linear')
    semantics (align_corners=False, half-pixel) — fires on the rect_encode
    non-native grids."""
    import torch
    import torch.nn.functional as F

    from cm3d_tpu.models.common import get_rel_pos

    rng = np.random.default_rng(11)
    rel = rng.standard_normal((127, 8)).astype(np.float32)
    q = k = 36  # needs 2*36-1 = 71 rows from the 127-row table
    got = np.asarray(get_rel_pos(q, k, jnp.asarray(rel)))

    resized = F.interpolate(
        torch.from_numpy(rel).reshape(1, 127, -1).permute(0, 2, 1),
        size=71, mode="linear",
    ).permute(0, 2, 1)[0].numpy()
    qc = np.arange(q)[:, None] * max(k / q, 1.0)
    kc = np.arange(k)[None, :] * max(q / k, 1.0)
    idx = (qc - kc + (k - 1) * max(q / k, 1.0)).astype(np.int64)
    want = resized[idx]
    np.testing.assert_allclose(got, want, atol=1e-5)
