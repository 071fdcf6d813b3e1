"""Greedy NMS variants as fixpoint iterations (exact greedy semantics).

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


def _greedy_keep_fixpoint(overlap: jax.Array, valid_sorted: jax.Array) -> jax.Array:
    """Exact greedy-NMS keep flags from a precomputed overlap matrix.

    Args:
      overlap: [N, N] bool, rows/cols in descending-score order; overlap[i, j]
        True iff box i would suppress box j (callers include the class/valid
        gating). Only the strictly-upper triangle is used (i < j).
      valid_sorted: [N] bool.

    The greedy recurrence keep[j] = valid[j] & ~any_{i<j}(overlap[i,j] &
    keep[i]) has a unique solution. Instead of N sequential steps (a
    fori_loop is latency-bound on TPU), iterate the whole-vector operator to
    its fixpoint: each sweep fixes every box whose suppression-chain depth it
    reaches, so the while_loop runs chain-depth times (typically < 10) with
    one [N, N] masked reduction per sweep — the TPU-shaped formulation of
    the same exact algorithm.
    """
    n = overlap.shape[0]
    upper = jnp.triu(jnp.ones((n, n), bool), k=1)
    ov = overlap & upper & valid_sorted[:, None]

    def body(state):
        keep, _ = state
        new = valid_sorted & ~jnp.any(ov & keep[:, None], axis=0)
        return new, jnp.any(new != keep)

    def cond(state):
        return state[1]

    keep, _ = jax.lax.while_loop(cond, body, (valid_sorted, jnp.array(True)))
    return keep


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

    dist_sq = (cx[:, None] - cx[None, :]) ** 2 + (cy[:, None] - cy[None, :]) ** 2
    # row i suppresses col j: same class, within box j's class radius
    # (== i's radius because of the same-class gate; the reference indexes
    # threshs_by_label[det_labels[j]], i.e. by the SUPPRESSED box — keep
    # thresh[None, :] if the class gate is ever relaxed)
    overlap = (lab[:, None] == lab[None, :]) & (dist_sq <= thresh[None, :])
    keep_sorted = _greedy_keep_fixpoint(overlap, val)
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
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    union = area[:, None] + area[None, :] - inter
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)
    overlap = (lab[:, None] == lab[None, :]) & (iou > iou_threshold)
    keep_sorted = _greedy_keep_fixpoint(overlap, val)
    return jnp.zeros(n, dtype=bool).at[order].set(keep_sorted)


def polygon_nms_keep(
    boxes_bev: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    nms_threshold: float = 0.4,
    score_threshold: float = 0.3,
) -> jax.Array:
    """Greedy rotated-box BEV NMS. boxes_bev: [N, 5] (cx, cy, w, l, yaw).

    The reference ships (but never calls) a shapely polygon-NMS
    (src/kitti/2d_to_3d.py nms:507-599, polygon_intersection_area:391-434);
    this is the jittable equivalent, with the SAME criterion: a candidate
    is suppressed when a kept higher-scored box's intersection covers more
    than nms_threshold of the CANDIDATE'S OWN area (poly_compare :487-505
    — inter/area[candidate], NOT IoU; defaults 0.4/0.3 from nms :524-536),
    and boxes scoring <= score_threshold are dropped up front. The
    intersection comes from the exact rotated-IoU clipper via
    inter = iou * (a_i + a_j) / (1 + iou). Tie-break: stable descending
    score. Returns keep [N] bool.
    """
    from cm3d_tpu.geometry.boxes import rotated_iou_bev

    n = scores.shape[0]
    valid = valid & (scores > score_threshold)
    neg = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-neg, stable=True)
    b = boxes_bev[order]
    val = valid[order]
    area = jnp.maximum(b[:, 2] * b[:, 3], 1e-9)  # [N]
    iou = rotated_iou_bev(b, b)  # [N, N]
    inter = iou * (area[:, None] + area[None, :]) / (1.0 + iou)
    overlap = inter / area[None, :]  # row i suppresses candidate column j
    keep_sorted = _greedy_keep_fixpoint(overlap > nms_threshold, val)
    return jnp.zeros(n, dtype=bool).at[order].set(keep_sorted)
