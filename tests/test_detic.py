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
