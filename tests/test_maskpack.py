"""Device plane postprocess vs the host mask oracle (upsample semantics of
pipelines.masks._logits_to_masks + ops.bitmask packing)."""

import numpy as np
import jax.numpy as jnp

from cm3d_tpu.ops.bitmask import pack_masks_np, unpack_masks_np
from cm3d_tpu.ops.maskpack import make_plane_postprocess
from cm3d_tpu.pipelines.masks import _logits_to_masks

RNG = np.random.default_rng(0)


def _oracle_planes(logits, n_boxes, cam_hw, mask_wh, num_words):
    w, h = mask_wh
    masks = []
    for c, (h_c, w_c) in enumerate(cam_hw):
        dense = _logits_to_masks(logits[c, : n_boxes[c]], (h_c, w_c))
        for m in dense:
            pad = np.zeros((w, h), np.uint8)
            pad[:w_c, :h_c] = m.T
            masks.append(pad)
    stacked = np.zeros((num_words * 32, w, h), np.uint8)
    for i, m in enumerate(masks[: num_words * 32]):
        stacked[i] = m
    return pack_masks_np(stacked)


def test_plane_postprocess_matches_host_oracle():
    cam_hw = [(48, 96), (32, 64), (48, 96)]
    mask_wh = (96, 48)
    num_words = 2
    c, p = len(cam_hw), 24
    logits = RNG.standard_normal((c, p, 16, 16)).astype(np.float32) * 3
    n_boxes = np.array([5, 0, 17], np.int32)

    post = make_plane_postprocess(mask_wh, cam_hw, num_words, chunk=8)
    planes = np.asarray(post(jnp.asarray(logits), jnp.asarray(n_boxes)))
    ref = _oracle_planes(logits, n_boxes, cam_hw, mask_wh, num_words)
    np.testing.assert_array_equal(planes, ref)


def test_plane_postprocess_drops_overflow_bits():
    cam_hw = [(16, 16)]
    post = make_plane_postprocess((16, 16), cam_hw, num_words=1, chunk=8)
    logits = np.full((1, 40, 8, 8), 5.0, np.float32)  # all-ones masks
    planes = np.asarray(post(jnp.asarray(logits), jnp.asarray([40])))
    # masks 32..39 exceed the 32-bit plane and must be dropped, not wrapped
    assert (planes == np.uint32(0xFFFFFFFF)).all()


def test_unpack_roundtrip():
    masks = (RNG.random((7, 20, 12)) > 0.5).astype(np.uint8)
    planes = pack_masks_np(masks)
    back = unpack_masks_np(planes, 7).astype(np.uint8)
    np.testing.assert_array_equal(back, masks)
