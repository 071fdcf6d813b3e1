"""ROIAlign (aligned / V2 semantics) as one-hot interpolation MATMULS.

Replaces detectron2's CUDA ROIAlignV2 used by the detector's box pooler.
Bilinear sampling on a separable (ys x xs) grid is two interpolation-matrix
contractions — pooled = My @ F @ Mx^T per ROI — which runs on the MXU
instead of as 50k-row gathers (the gather formulation was 70% of Detic's
device time on TPU). The per-bin sample mean folds into the matrices, so
the whole ROIAlign is exactly two einsums.

Static shapes: a fixed number of ROIs, fixed output size, fixed sampling
ratio (detectron2's sampling_ratio=0 means an adaptive per-ROI grid, which
is data-dependent and does not compile — we fix 2x2 samples per bin, the
value detectron2 computes for typical ROI/output ratios; torchvision parity
is tested at sampling_ratio=2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _interp_matrix(coords: jax.Array, size: int, oo: int, s: int) -> jax.Array:
    """Bilinear interpolation weights, bin-averaged: [R, oo*s] continuous
    coords -> [R, oo, size] with rows summing to <=1 (0 where all samples of
    the bin fall outside [-1, size], torchvision skip semantics)."""
    c0 = jnp.floor(coords)
    frac = coords - c0
    c0i = jnp.clip(c0.astype(jnp.int32), 0, size - 1)
    c1i = jnp.clip(c0i + 1, 0, size - 1)
    # clamp continuous coords into [0, size-1] like the CUDA kernel
    w1 = jnp.where(coords <= 0, 0.0, jnp.where(coords >= size - 1, 0.0, frac))
    valid = (coords >= -1.0) & (coords <= size)
    rng = jnp.arange(size)
    m = (rng == c0i[..., None]) * ((1.0 - w1) * valid)[..., None] + (
        rng == c1i[..., None]
    ) * (w1 * valid)[..., None]
    r = coords.shape[0]
    return m.reshape(r, oo, s, size).mean(axis=2)  # [R, oo, size]


def roi_align(
    features: jax.Array,  # [H, W, C]
    boxes: jax.Array,  # [R, 4] xyxy in feature-grid coordinates
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jax.Array:
    """Aligned ROIAlign. Returns [R, output_size, output_size, C]."""
    h, w, c = features.shape
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

    my = _interp_matrix(ys, h, oo, s)  # [R, oo, H]
    mx = _interp_matrix(xs, w, oo, s)  # [R, oo, W]
    f32 = jnp.float32
    rows = jnp.einsum(
        "rah,hwc->rawc", my.astype(f32), features.astype(f32)
    )
    return jnp.einsum("rawc,rbw->rabc", rows, mx.astype(f32))


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
