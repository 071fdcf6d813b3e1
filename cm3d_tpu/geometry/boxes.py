"""3D box utilities: corners, BEV footprints, 7-DoF conversion, rotated IoU.

The reference computes box corners ad hoc per dataset
(src/kitti/kitti_utils.py:605-640 `compute_box_3d`; the fusion stage builds
7-DoF arrays [cx, cy, bottom_z, l, w, h, heading] in
src/nuscenes/linear_matching.py:164-172). Here they are batched JAX ops.

Box convention: center [cx, cy, cz], size [w, l, h] (nuScenes order: width
along box-local y? — no: nuScenes stores size as (w, l, h) where l is along
the box heading x-axis), yaw about +z.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_corners_bev(centers: jax.Array, sizes_wlh: jax.Array, yaws: jax.Array) -> jax.Array:
    """BEV footprint corners. centers [..., 2], sizes (w, l, h) [..., 3],
    yaws [...]. Returns [..., 4, 2] corners, counter-clockwise.

    Length l runs along the heading (box-local x), width w across it.
    """
    w = sizes_wlh[..., 0]
    length = sizes_wlh[..., 1]
    # Box-local corner offsets (x along heading).
    dx = jnp.stack([length, length, -length, -length], axis=-1) / 2.0
    dy = jnp.stack([w, -w, -w, w], axis=-1) / 2.0
    c, s = jnp.cos(yaws)[..., None], jnp.sin(yaws)[..., None]
    gx = centers[..., :1] + c * dx - s * dy
    gy = centers[..., 1:2] + s * dx + c * dy
    return jnp.stack([gx, gy], axis=-1)


def box_corners_3d(centers: jax.Array, sizes_wlh: jax.Array, yaws: jax.Array) -> jax.Array:
    """Full 8 corners [..., 8, 3]: bottom face then top face, CCW."""
    bev = box_corners_bev(centers[..., :2], sizes_wlh, yaws)  # [..., 4, 2]
    h = sizes_wlh[..., 2]
    z_bot = centers[..., 2] - h / 2.0
    z_top = centers[..., 2] + h / 2.0
    bot = jnp.concatenate([bev, jnp.broadcast_to(z_bot[..., None, None], bev.shape[:-1] + (1,))], axis=-1)
    top = jnp.concatenate([bev, jnp.broadcast_to(z_top[..., None, None], bev.shape[:-1] + (1,))], axis=-1)
    return jnp.concatenate([bot, top], axis=-2)


def boxes_to_7dof(centers: jax.Array, sizes_wlh: jax.Array, yaws: jax.Array) -> jax.Array:
    """Pack to the fusion stage's 7-DoF layout
    [cx, cy, bottom_z, length, width, height, heading]
    (reference: src/nuscenes/linear_matching.py:164-172 packs
    translation[0], translation[1], z - h/2, size[1], size[0], size[2], yaw).
    """
    w = sizes_wlh[..., 0]
    length = sizes_wlh[..., 1]
    h = sizes_wlh[..., 2]
    return jnp.stack(
        [
            centers[..., 0],
            centers[..., 1],
            centers[..., 2] - h / 2.0,
            length,
            w,
            h,
            yaws,
        ],
        axis=-1,
    )


def rotated_iou_bev(
    boxes_a: jax.Array, boxes_b: jax.Array
) -> jax.Array:
    """Exact rotated-rectangle IoU in BEV between [A, 5] and [B, 5]
    boxes (cx, cy, w, l, yaw). Returns [A, B].

    Sutherland–Hodgman polygon clipping with fixed-size vertex buffers
    (rect ∩ rect has ≤ 8 vertices) so the whole thing stays jittable — the
    TPU-native replacement for the reference's GEOS/shapely and the
    waymo-open-dataset C++ IoU op (src/nuscenes/linear_matching.py:107-121).
    """
    corners_a = box_corners_bev(
        boxes_a[:, :2], jnp.stack([boxes_a[:, 2], boxes_a[:, 3], boxes_a[:, 3]], -1), boxes_a[:, 4]
    )[:, ::-1, :]  # [A, 4, 2], flipped to counter-clockwise
    corners_b = box_corners_bev(
        boxes_b[:, :2], jnp.stack([boxes_b[:, 2], boxes_b[:, 3], boxes_b[:, 3]], -1), boxes_b[:, 4]
    )[:, ::-1, :]  # [B, 4, 2], counter-clockwise

    area_a = boxes_a[:, 2] * boxes_a[:, 3]
    area_b = boxes_b[:, 2] * boxes_b[:, 3]

    inter = _rect_intersection_area(corners_a, corners_b)  # [A, B]
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)


def _rect_intersection_area(corners_a: jax.Array, corners_b: jax.Array) -> jax.Array:
    """Intersection area of every rect pair. corners_a [A,4,2], corners_b
    [B,4,2] (CCW). Returns [A,B]. Clips A's rect against B's 4 half-planes."""
    A = corners_a.shape[0]
    B = corners_b.shape[0]
    K = 8  # max vertices of rect∩rect

    # init polygon buffers: [A, B, K, 2], valid counts [A, B]
    poly = jnp.zeros((A, B, K, 2), dtype=corners_a.dtype)
    poly = poly.at[:, :, :4, :].set(corners_a[:, None, :, :])
    n = jnp.full((A, B), 4, dtype=jnp.int32)

    # Edges of B as half-planes (inside = left of edge for CCW).
    eb0 = corners_b  # [B, 4, 2]
    eb1 = jnp.roll(corners_b, -1, axis=1)

    def clip_edge(carry, e):
        poly, n = carry
        p0, p1 = e  # [B, 2] each
        d = p1 - p0  # [B, 2]

        # Signed side of each polygon vertex wrt the edge: cross(d, v - p0)
        v = poly  # [A, B, K, 2]
        rel = v - p0[None, :, None, :]
        side = d[None, :, None, 0] * rel[..., 1] - d[None, :, None, 1] * rel[..., 0]
        inside = side >= 0  # [A, B, K]

        idx = jnp.arange(K)
        valid = idx[None, None, :] < n[..., None]
        nxt_idx = jnp.where(idx[None, None, :] + 1 < n[..., None], idx + 1, 0)
        v_next = jnp.take_along_axis(v, nxt_idx[..., None].astype(jnp.int32), axis=2)
        side_next = jnp.take_along_axis(side, nxt_idx, axis=2)
        inside_next = side_next >= 0

        # Intersection point of segment (v, v_next) with the edge line.
        denom = side - side_next
        t = side / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        ipt = v + t[..., None] * (v_next - v)

        # Output construction (Sutherland–Hodgman): for each input edge emit
        # up to 2 vertices. We materialize 2K output slots then compact.
        emit_v = inside & valid  # emit current vertex
        emit_i = (inside ^ inside_next) & valid  # emit intersection

        out_pts = jnp.zeros((A, B, 2 * K, 2), dtype=poly.dtype)
        out_pts = out_pts.at[:, :, 0::2, :].set(v)
        out_pts = out_pts.at[:, :, 1::2, :].set(ipt)
        emit = jnp.zeros((A, B, 2 * K), dtype=bool)
        emit = emit.at[:, :, 0::2].set(emit_v)
        emit = emit.at[:, :, 1::2].set(emit_i)

        # Compact: stable order of emitted slots.
        order = jnp.argsort(~emit, axis=-1, stable=True)  # emitted first
        out_sorted = jnp.take_along_axis(out_pts, order[..., None], axis=2)
        new_n = jnp.sum(emit, axis=-1).astype(jnp.int32)
        new_n = jnp.minimum(new_n, K)
        new_poly = out_sorted[:, :, :K, :]
        # pad invalid slots by repeating vertex 0 (harmless for shoelace w/ n)
        return (new_poly, new_n), None

    (poly, n), _ = jax.lax.scan(
        clip_edge,
        (poly, n),
        (jnp.swapaxes(eb0, 0, 1), jnp.swapaxes(eb1, 0, 1)),  # [4, B, 2] each
    )

    # Shoelace over [A, B, K, 2] with counts n
    k_idx = jnp.arange(K)
    valid = k_idx[None, None, :] < n[..., None]
    nxt = jnp.where(k_idx[None, None, :] + 1 < n[..., None], k_idx + 1, 0)
    x, y = poly[..., 0], poly[..., 1]
    x2 = jnp.take_along_axis(x, nxt, axis=-1)
    y2 = jnp.take_along_axis(y, nxt, axis=-1)
    cross = x * y2 - x2 * y
    area = 0.5 * jnp.abs(jnp.sum(jnp.where(valid, cross, 0.0), axis=-1))
    return jnp.where(n >= 3, area, 0.0)
