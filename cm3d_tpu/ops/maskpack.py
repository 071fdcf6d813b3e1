"""Device-side SAM mask postprocess: logits -> packed bit-plane tensor.

The reference pipeline upsamples each low-res mask logit map to image size
with bilinear interpolation, thresholds at 0, transposes to [W, H] and
RLE-encodes on the CPU (gen_2d_masks_detic.py:454-472 + SamPredictor
postprocess). Done per mask on host, that transfer is ~130 MB/frame of
padded masks. Here the whole postprocess runs on device and emits the SAME
bit-packed [W, H, ceil(M/32)] uint32 tensor the lift step consumes
(cm3d_tpu.ops.bitmask layout: bit m of word [x, y, m//32]), so one keyframe
transfers ~9 MB regardless of padding, and a fused masks->lift pipeline
needs no host round trip at all.

Packing trick: bits are grouped into (word, byte) lanes; each mask
contributes 2^(bit%8) to its lane, so packing a chunk of masks is ONE
[lanes, P_chunk] x [P_chunk, W*H] matmul in f32 (every partial sum <= 255,
exact in f32) — MXU work instead of 128-bit shifts.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def make_plane_postprocess(
    mask_wh: Tuple[int, int],
    cam_hw: Sequence[Tuple[int, int]],
    num_words: int,
    chunk: int = 16,
    rect: bool = False,
    layout: str = "xy",
):
    """Build a jittable fn: (logits [C, P, hm, wm], n_boxes [C]) ->
    planes [W, H, num_words] uint32 (layout "xy", the lift step's input)
    or [H, W, num_words] (layout "yx", sequential for the host COCO-RLE
    encoder — rle.encode_packed_many scans Fortran order zero-copy).

    Masks are bit-indexed camera-major in artifact order: mask p of camera c
    gets bit offset(c) + p where offset = cumsum(n_boxes). Prompts beyond
    n_boxes[c] and bits beyond 32*num_words are dropped.

    Args:
      mask_wh: (W, H) plane extent (the largest camera geometry).
      cam_hw: static per-camera true image (h, w) — masks are cropped to it.
      num_words: Mw words of 32 mask bits.
      chunk: prompts upsampled per scan step (bounds the [chunk, side, side]
        f32 intermediate).
      rect: logits come from a rect-encoded SAM (SamConfig.rect_encode):
        they cover the image directly at 1/4 resolution, so upsample by an
        exact 4x per axis instead of to the padded square.
    """
    w_plane, h_plane = mask_wh
    lanes = num_words * 4  # (word, byte) lanes
    if layout not in ("xy", "yx"):
        raise ValueError(f"layout must be 'xy' or 'yx', got {layout!r}")
    xy = layout == "xy"

    def postprocess(logits: jax.Array, n_boxes: jax.Array) -> jax.Array:
        c, p, hm, wm = logits.shape
        assert c == len(cam_hw), (c, len(cam_hw))
        offsets = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(n_boxes.astype(jnp.int32))[:-1]]
        )
        acc = jnp.zeros((lanes, w_plane * h_plane), jnp.float32)

        for ci in range(c):
            h_c, w_c = cam_hw[ci]
            up_hw = (4 * hm, 4 * wm) if rect else (max(h_c, w_c),) * 2
            bit = offsets[ci] + jnp.arange(p, dtype=jnp.int32)
            ok = (jnp.arange(p) < n_boxes[ci]) & (bit < num_words * 32)
            word = jnp.clip(bit >> 5, 0, num_words - 1)
            byte = (bit >> 3) & 3
            lane = word * 4 + byte
            weight_val = jnp.where(ok, (1 << (bit & 7)).astype(jnp.float32), 0.0)
            # [lanes, P] one-hot-weighted lane matrix
            lane_mat = (
                (lane[None, :] == jnp.arange(lanes)[:, None]) * weight_val[None, :]
            )

            n_chunks = -(-p // chunk)
            pad_p = n_chunks * chunk
            lg = jnp.pad(logits[ci], ((0, pad_p - p), (0, 0), (0, 0)))
            lg = lg.reshape(n_chunks, chunk, hm, wm)
            lm = jnp.pad(lane_mat, ((0, 0), (0, pad_p - p)))
            lm = lm.reshape(lanes, n_chunks, chunk)

            def body(carry, inp):
                lg_c, lm_c = inp  # [chunk, hm, wm], [lanes, chunk]
                up = jax.image.resize(
                    lg_c.astype(jnp.float32),
                    (chunk,) + up_hw, method="bilinear",
                )
                m = (up[:, :h_c, :w_c] > 0).astype(jnp.float32)  # [chunk,h,w]
                if xy:
                    m = jnp.swapaxes(m, 1, 2)  # [chunk, w_c, h_c]
                    m = jnp.pad(
                        m, ((0, 0), (0, w_plane - w_c), (0, h_plane - h_c))
                    )
                else:
                    m = jnp.pad(
                        m, ((0, 0), (0, h_plane - h_c), (0, w_plane - w_c))
                    )
                m = m.reshape(chunk, w_plane * h_plane)
                return carry + lm_c @ m, None

            acc, _ = jax.lax.scan(
                body, acc, (lg, jnp.moveaxis(lm, 1, 0)), length=n_chunks
            )

        shp = (w_plane, h_plane) if xy else (h_plane, w_plane)
        by = acc.reshape((num_words, 4) + shp).astype(jnp.uint32)
        planes = (
            by[:, 0] | (by[:, 1] << 8) | (by[:, 2] << 16) | (by[:, 3] << 24)
        )
        return jnp.moveaxis(planes, 0, -1)  # [W, H, nw] or [H, W, nw]

    return postprocess


# Host inverse is ops.bitmask.unpack_masks_np ([W, H, Mw] -> [M, W, H]).
