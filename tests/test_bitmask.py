"""Bit-packed mask codec + packed erosion vs cv2 oracle."""

import numpy as np
import jax.numpy as jnp

from cm3d_tpu.ops.bitmask import (
    erode3x3_packed,
    num_words,
    pack_masks_np,
    extract_bit,
    unpack_masks_np,
)

RNG = np.random.default_rng(3)


def test_pack_unpack_roundtrip():
    for m in [1, 31, 32, 33, 64, 100]:
        masks = RNG.random((m, 37, 23)) > 0.5
        words = pack_masks_np(masks)
        assert words.shape == (37, 23, num_words(m))
        assert words.dtype == np.uint32
        np.testing.assert_array_equal(unpack_masks_np(words, m), masks)


def test_packed_erosion_matches_cv2():
    import cv2

    masks = (RNG.random((40, 64, 48)) > 0.4).astype(np.uint8)
    words = pack_masks_np(masks.astype(bool))
    eroded_words = np.asarray(erode3x3_packed(jnp.asarray(words)))
    ours = unpack_masks_np(eroded_words, 40)
    kernel = np.ones((3, 3), np.uint8)
    for i in range(40):
        ref = cv2.erode(masks[i], kernel).astype(bool)
        np.testing.assert_array_equal(ours[i], ref, err_msg=f"mask {i}")


def test_extract_bit():
    m = 70
    masks = RNG.random((m, 16, 8)) > 0.5
    words = jnp.asarray(pack_masks_np(masks))  # [16, 8, 3]
    flat = words.reshape(16 * 8, num_words(m))
    ids = jnp.arange(m, dtype=jnp.int32)
    rows = flat[:, ids >> 5].T  # [M, 128]
    got = np.asarray(extract_bit(rows, ids))
    np.testing.assert_array_equal(got, masks.reshape(m, -1))
