"""ROIAlign (aligned / V2 semantics) as pure-JAX bilinear gathers.

Replaces detectron2's CUDA ROIAlignV2 used by the detector's box pooler.
Static shapes: a fixed number of ROIs, fixed output size, fixed sampling
ratio (detectron2's sampling_ratio=0 means an adaptive per-ROI grid, which
is data-dependent and does not compile — we fix 2x2 samples per bin, the
value detectron2 computes for typical ROI/output ratios; torchvision parity
is tested at sampling_ratio=2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def roi_align(
    features: jax.Array,  # [H, W, C]
    boxes: jax.Array,  # [R, 4] xyxy in feature-grid coordinates
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jax.Array:
    """Aligned ROIAlign. Returns [R, output_size, output_size, C]."""
    h, w, c = features.shape
    r = boxes.shape[0]
    oo = output_size
    s = sampling_ratio

    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    # aligned=True: offset by -0.5 (continuous coordinate convention)
    roi_w = jnp.maximum(x2 - x1, 1e-6)
    roi_h = jnp.maximum(y2 - y1, 1e-6)
    bin_w = roi_w / oo
    bin_h = roi_h / oo

    # sample positions: for bin (i, j), samples at
    # y = y1 + (i + (k+0.5)/s) * bin_h - 0.5 for k in range(s)
    grid = (jnp.arange(oo)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s).reshape(-1)
    ys = y1[:, None] + grid[None, :] * bin_h[:, None] - 0.5  # [R, oo*s]
    xs = x1[:, None] + grid[None, :] * bin_w[:, None] - 0.5

    def bilinear(yy, xx):
        """yy: [R, A], xx: [R, B] -> [R, A, B, C]."""
        y0 = jnp.floor(yy)
        x0 = jnp.floor(xx)
        wy1 = yy - y0
        wx1 = xx - x0
        y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
        y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
        x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
        x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
        # out-of-bounds samples contribute zero (torchvision semantics:
        # sample skipped if y < -1 or y > H)
        valid_y = (yy >= -1.0) & (yy <= h)
        valid_x = (xx >= -1.0) & (xx <= w)
        # clamp continuous coords into [0, H-1] like the CUDA kernel
        wy1 = jnp.where(yy <= 0, 0.0, jnp.where(yy >= h - 1, 0.0, wy1))
        wx1 = jnp.where(xx <= 0, 0.0, jnp.where(xx >= w - 1, 0.0, wx1))
        f00 = features[y0i[:, :, None], x0i[:, None, :]]  # [R, A, B, C]
        f01 = features[y0i[:, :, None], x1i[:, None, :]]
        f10 = features[y1i[:, :, None], x0i[:, None, :]]
        f11 = features[y1i[:, :, None], x1i[:, None, :]]
        wy1b = wy1[:, :, None, None]
        wx1b = wx1[:, None, :, None]
        out = (
            f00 * (1 - wy1b) * (1 - wx1b)
            + f01 * (1 - wy1b) * wx1b
            + f10 * wy1b * (1 - wx1b)
            + f11 * wy1b * wx1b
        )
        return out * (valid_y[:, :, None, None] & valid_x[:, None, :, None])

    samples = bilinear(ys, xs)  # [R, oo*s, oo*s, C]
    samples = samples.reshape(r, oo, s, oo, s, c)
    return jnp.mean(samples, axis=(2, 4))


def assign_fpn_levels(
    boxes: jax.Array,
    min_level: int,
    max_level: int,
    canonical_size: float = 224.0,
    canonical_level: int = 4,
) -> jax.Array:
    """detectron2 level assignment: floor(canonical + log2(sqrt(area)/size))."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    lvl = jnp.floor(
        canonical_level + jnp.log2(jnp.sqrt(area) / canonical_size + 1e-8)
    )
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


def multilevel_roi_align(
    features: dict,  # {level: [H_l, W_l, C]}
    boxes: jax.Array,  # [R, 4] xyxy in IMAGE coordinates
    strides: dict,  # {level: stride}
    output_size: int = 7,
    min_level: int = 3,
    max_level: int = 5,
) -> jax.Array:
    """Pool each ROI from its assigned FPN level (static: pool from every
    level, select by assignment mask)."""
    levels = assign_fpn_levels(boxes, min_level, max_level)
    out = None
    for lvl in range(min_level, max_level + 1):
        scaled = boxes / strides[lvl]
        pooled = roi_align(features[lvl], scaled, output_size)
        sel = (levels == lvl)[:, None, None, None]
        out = pooled * sel if out is None else out + pooled * sel
    return out
