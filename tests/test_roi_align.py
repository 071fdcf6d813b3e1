"""ROIAlign vs a literal numpy transcription of the aligned-ROIAlign spec
(torchvision's CUDA kernel semantics; torchvision itself is not installed)."""

import numpy as np
import jax.numpy as jnp

from cm3d_tpu.ops.roi_align import assign_fpn_levels, multilevel_roi_align, roi_align

RNG = np.random.default_rng(29)


def roi_align_np(feats_hwc, boxes, out_size, sampling):
    """Aligned ROIAlign oracle: continuous coords, -0.5 offset, bilinear
    samples averaged per bin; samples outside [-1, H] are zero; border
    clamping like the reference kernel."""
    h, w, c = feats_hwc.shape
    out = np.zeros((len(boxes), out_size, out_size, c), np.float64)
    for r, (x1, y1, x2, y2) in enumerate(boxes):
        bin_h = (y2 - y1) / out_size
        bin_w = (x2 - x1) / out_size
        for i in range(out_size):
            for j in range(out_size):
                acc = np.zeros(c)
                for ky in range(sampling):
                    for kx in range(sampling):
                        y = y1 + (i + (ky + 0.5) / sampling) * bin_h - 0.5
                        x = x1 + (j + (kx + 0.5) / sampling) * bin_w - 0.5
                        if y < -1.0 or y > h or x < -1.0 or x > w:
                            continue
                        y_ = min(max(y, 0.0), h - 1)
                        x_ = min(max(x, 0.0), w - 1)
                        y0, x0 = int(np.floor(y_)), int(np.floor(x_))
                        y1i, x1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                        wy, wx = y_ - y0, x_ - x0
                        acc += (
                            feats_hwc[y0, x0] * (1 - wy) * (1 - wx)
                            + feats_hwc[y0, x1i] * (1 - wy) * wx
                            + feats_hwc[y1i, x0] * wy * (1 - wx)
                            + feats_hwc[y1i, x1i] * wy * wx
                        )
                out[r, i, j] = acc / (sampling * sampling)
    return out.astype(np.float32)


def test_roi_align_matches_numpy_oracle():
    h, w, c = 24, 32, 5
    feats = RNG.random((h, w, c)).astype(np.float32)
    boxes = np.array(
        [
            [2.0, 3.0, 20.0, 17.0],
            [0.0, 0.0, 31.9, 23.9],
            [10.3, 5.7, 14.9, 9.2],
            [-2.0, -2.0, 5.0, 5.0],  # partially out of bounds
        ],
        np.float32,
    )
    want = roi_align_np(feats, boxes, 7, 2)
    got = np.asarray(roi_align(jnp.asarray(feats), jnp.asarray(boxes), 7, 2))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fpn_level_assignment():
    boxes = jnp.asarray(
        np.array(
            [
                [0, 0, 56, 56],      # sqrt(area)=56 -> lvl 2 -> clamp 3
                [0, 0, 224, 224],    # -> 4
                [0, 0, 448, 448],    # -> 5
                [0, 0, 2000, 2000],  # -> clamp 5
            ],
            np.float32,
        )
    )
    lv = np.asarray(assign_fpn_levels(boxes, 3, 5))
    assert list(lv) == [3, 4, 5, 5]


def test_multilevel_pool_selects_by_size():
    feats = {
        3: jnp.asarray(RNG.random((32, 32, 2)).astype(np.float32)),
        4: jnp.asarray(RNG.random((16, 16, 2)).astype(np.float32)),
        5: jnp.asarray(RNG.random((8, 8, 2)).astype(np.float32)),
    }
    strides = {3: 8, 4: 16, 5: 32}
    boxes = jnp.asarray(
        np.array([[0, 0, 56, 56], [0, 0, 224, 224]], np.float32)
    )
    out = np.asarray(multilevel_roi_align(feats, boxes, strides, 7))
    want0 = np.asarray(roi_align(feats[3], boxes[:1] / 8, 7))
    np.testing.assert_allclose(out[0], want0[0], atol=1e-5)
    want1 = np.asarray(roi_align(feats[4], boxes[1:] / 16, 7))
    np.testing.assert_allclose(out[1], want1[0], atol=1e-5)
