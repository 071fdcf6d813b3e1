"""Training targets: boxes -> gaussian heatmaps + dense regression targets.

CenterPoint target construction: each box splats a gaussian at its center
cell (radius from the box footprint), regression targets live at the center
cell only. Fixed-shape: boxes arrive padded [M, 8] (x, y, z, w, l, h, yaw,
class) with a validity mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cm3d_tpu.train.voxelize import PillarConfig


def gaussian_radius(l_cells: jax.Array, w_cells: jax.Array,
                    min_overlap: float = 0.1) -> jax.Array:
    """CenterNet radius heuristic, clamped to >= 1 cell."""
    a1 = 1.0
    b1 = l_cells + w_cells
    c1 = w_cells * l_cells * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(b1 * b1 - 4 * a1 * c1, 0.0))
    r1 = (b1 + sq1) / 2
    return jnp.maximum(jnp.minimum(r1 / 6.0, jnp.minimum(l_cells, w_cells)), 1.0)


def build_targets(
    boxes: jax.Array,  # [M, 8] (x, y, z, w, l, h, yaw, class_id)
    box_valid: jax.Array,  # [M]
    pillar_cfg: PillarConfig,
    num_classes: int,
    out_stride: int = 2,
):
    """Returns (heatmap [H', W', C], reg [H', W', 8], reg_mask [H', W'])
    where reg = (dx, dy, z, log w, log l, log h, sin, cos)."""
    gh, gw = pillar_cfg.grid_hw
    h, w = gh // out_stride, gw // out_stride
    res = pillar_cfg.resolution * out_stride

    cx = (boxes[:, 0] - pillar_cfg.x_min) / res
    cy = (boxes[:, 1] - pillar_cfg.y_min) / res
    ix = jnp.floor(cx).astype(jnp.int32)
    iy = jnp.floor(cy).astype(jnp.int32)
    in_grid = box_valid & (ix >= 0) & (ix < h) & (iy >= 0) & (iy < w)

    radius = gaussian_radius(boxes[:, 4] / res, boxes[:, 3] / res)
    sigma = radius / 3.0

    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]

    def splat(args):
        bx, by, r, cls, ok = args
        g = jnp.exp(
            -(((ys - bx) ** 2) + ((xs - by) ** 2)) / (2 * r * r)
        )  # note: grid axis 0 is x
        g = jnp.where(ok, g, 0.0)
        return g[:, :, None] * jax.nn.one_hot(cls, num_classes)[None, None, :]

    # gaussians center on the INTEGER center cell (CenterNet convention:
    # the peak is exactly 1.0 there; the offset head owns the fraction)
    gaussians = jax.vmap(splat)(
        (ix.astype(jnp.float32), iy.astype(jnp.float32), sigma,
         boxes[:, 7].astype(jnp.int32), in_grid)
    )
    heatmap = jnp.max(gaussians, axis=0)  # [H', W', C]

    # regression at center cells (last writer wins on collisions);
    # out-of-grid / invalid boxes redirect OUT of bounds so mode="drop"
    # discards their writes (clamping them instead would zero a valid
    # box's targets in the clamped edge cell — common with GT labels
    # beyond the pillar range or augmentation pushing boxes off-grid)
    reg = jnp.zeros((h, w, 8))
    reg_mask = jnp.zeros((h, w), bool)
    ixc = jnp.where(in_grid, ix, h)
    iyc = jnp.where(in_grid, iy, w)
    vals = jnp.stack(
        [
            cx - (ix.astype(jnp.float32) + 0.5),
            cy - (iy.astype(jnp.float32) + 0.5),
            boxes[:, 2],
            jnp.log(jnp.maximum(boxes[:, 3], 1e-3)),
            jnp.log(jnp.maximum(boxes[:, 4], 1e-3)),
            jnp.log(jnp.maximum(boxes[:, 5], 1e-3)),
            jnp.sin(boxes[:, 6]),
            jnp.cos(boxes[:, 6]),
        ],
        axis=1,
    )
    reg = reg.at[ixc, iyc].set(vals, mode="drop")
    reg_mask = reg_mask.at[ixc, iyc].set(True, mode="drop")
    return heatmap, reg, reg_mask


def focal_loss(pred_logits: jax.Array, gt: jax.Array,
               alpha: float = 2.0, beta: float = 4.0) -> jax.Array:
    """Penalty-reduced pixelwise focal loss (CenterNet eq. 1)."""
    p = jax.nn.sigmoid(pred_logits)
    pos = (gt >= 0.999).astype(jnp.float32)
    neg = 1.0 - pos
    pos_loss = -pos * ((1 - p) ** alpha) * jnp.log(jnp.maximum(p, 1e-8))
    neg_loss = (
        -neg * ((1 - gt) ** beta) * (p ** alpha)
        * jnp.log(jnp.maximum(1 - p, 1e-8))
    )
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)
    return (jnp.sum(pos_loss) + jnp.sum(neg_loss)) / n_pos


def reg_loss(pred: jax.Array, gt: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked L1 over the 8 regression channels at center cells."""
    m = mask.astype(jnp.float32)[..., None]
    return jnp.sum(jnp.abs(pred - gt) * m) / jnp.maximum(jnp.sum(m) * 8, 1.0)
