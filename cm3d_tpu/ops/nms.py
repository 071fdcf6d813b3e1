"""Greedy NMS variants as fixed-trip-count JAX loops.

- `circle_nms_keep`: BEV center-distance circle NMS with per-class radii,
  matching CenterPoint-style greedy semantics the reference uses
  (src/nuscenes/2d_to_3d.py:309-332 `circle_nms`, thresholds :850-861).
- `nms_2d_classwise`: class-wise axis-aligned 2D box NMS, replacing the
  reference's per-class `torchvision.ops.nms` loop
  (src/nuscenes/gen_2d_masks_detic.py:348-372).

Both are order-dependent greedy algorithms; we sort by score descending with
a STABLE sort so tie-breaking is deterministic (the reference's
`np.argsort()[::-1]` uses an unstable quicksort — ties there are
implementation-defined, so determinism here is a strict improvement).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def circle_nms_keep(
    centers_xy: jax.Array,
    scores: jax.Array,
    labels: jax.Array,
    valid: jax.Array,
    radius_sq_by_label: jax.Array,
) -> jax.Array:
    """Greedy BEV circle NMS.

    Args:
      centers_xy: [N, 2] box centers.
      scores: [N].
      labels: [N] int32 class ids.
      valid: [N] bool.
      radius_sq_by_label: [num_classes] squared-distance thresholds, indexed
        by label. (The reference compares squared distance directly against
        its per-class `threshs_by_label` values — i.e. those values ARE the
        squared thresholds. Reproduced as-is.)

    Returns keep [N] bool. A box is kept iff, scanning boxes in descending
    score order, it has not been suppressed by an earlier *kept* box of the
    same class within the class radius (reference 2d_to_3d.py:317-332).
    """
    n = scores.shape[0]
    neg = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-neg, stable=True)  # descending, stable

    cx = centers_xy[order, 0]
    cy = centers_xy[order, 1]
    lab = labels[order]
    val = valid[order]
    thresh = radius_sq_by_label[lab]

    def body(i, state):
        suppressed = state
        active = val[i] & ~suppressed[i]
        dist_sq = (cx[i] - cx) ** 2 + (cy[i] - cy) ** 2
        same = lab == lab[i]
        later = jnp.arange(n) > i
        supp_new = active & later & same & (dist_sq <= thresh)
        return suppressed | supp_new

    suppressed = jax.lax.fori_loop(0, n, body, jnp.zeros(n, dtype=bool))
    keep_sorted = val & ~suppressed
    keep = jnp.zeros(n, dtype=bool).at[order].set(keep_sorted)
    return keep


def nms_2d_classwise(
    boxes_xyxy: jax.Array,
    scores: jax.Array,
    labels: jax.Array,
    valid: jax.Array,
    iou_threshold: float = 0.75,
) -> jax.Array:
    """Greedy class-wise axis-aligned NMS. Returns keep [N] bool.

    Matches torchvision.ops.nms semantics per class: boxes sorted by score
    descending; a box is suppressed if IoU with any higher-scored kept box
    of the same class exceeds `iou_threshold` (strictly greater, like
    torchvision). The reference runs IoU 0.75 per class
    (src/nuscenes/gen_2d_masks_detic.py:361).
    """
    n = scores.shape[0]
    neg = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-neg, stable=True)

    b = boxes_xyxy[order]
    lab = labels[order]
    val = valid[order]

    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    area = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)

    def body(i, suppressed):
        active = val[i] & ~suppressed[i]
        ix1 = jnp.maximum(x1[i], x1)
        iy1 = jnp.maximum(y1[i], y1)
        ix2 = jnp.minimum(x2[i], x2)
        iy2 = jnp.minimum(y2[i], y2)
        inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
        union = area[i] + area - inter
        iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)
        later = jnp.arange(n) > i
        supp_new = active & later & (lab == lab[i]) & (iou > iou_threshold)
        return suppressed | supp_new

    suppressed = jax.lax.fori_loop(0, n, body, jnp.zeros(n, dtype=bool))
    keep_sorted = val & ~suppressed
    return jnp.zeros(n, dtype=bool).at[order].set(keep_sorted)


def polygon_nms_keep(
    boxes_bev: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    iou_threshold: float = 0.5,
) -> jax.Array:
    """Greedy rotated-box BEV NMS. boxes_bev: [N, 5] (cx, cy, w, l, yaw).

    The reference ships (but never calls) a shapely polygon-NMS
    (src/kitti/2d_to_3d.py nms:507-599, polygon_intersection_area:391-434);
    this is the jittable equivalent built on the exact rotated-IoU clipper.
    Returns keep [N] bool.
    """
    from cm3d_tpu.geometry.boxes import rotated_iou_bev

    n = scores.shape[0]
    neg = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-neg, stable=True)
    b = boxes_bev[order]
    val = valid[order]
    iou = rotated_iou_bev(b, b)  # [N, N]

    def body(i, suppressed):
        active = val[i] & ~suppressed[i]
        later = jnp.arange(n) > i
        supp_new = active & later & (iou[i] > iou_threshold)
        return suppressed | supp_new

    suppressed = jax.lax.fori_loop(0, n, body, jnp.zeros(n, dtype=bool))
    keep_sorted = val & ~suppressed
    return jnp.zeros(n, dtype=bool).at[order].set(keep_sorted)
