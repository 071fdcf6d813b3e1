"""Fused 2D->3D lifting: packed-mask erode -> project -> frustum cull ->
per-camera compaction -> bit-test in-mask gather -> per-mask compaction ->
medoid, plus box building (lane yaw, pushback, circle NMS).

This one jittable function replaces the reference's per-mask Python loop
(src/nuscenes/2d_to_3d.py:510-665) — which re-transforms the FULL aggregated
point cloud once per mask — with a TPU-shaped dataflow:

  1. one projection per camera (masks of the same camera share it),
  2. top_k compaction of in-frustum points per camera (N -> NC), order
     preserving, so later stages never touch out-of-view points,
  3. ONE uint32 word gather per (camera, point) from bit-packed masks
     (cm3d_tpu.ops.bitmask) + vectorized bit tests -> [M, NC] membership,
  4. per-mask compaction (NU -> K) of point coords+ids via the Pallas
     one-hot-matmul kernel (kernels/compact_pallas.py; top_k+gather on
     non-TPU backends),
  5. batched count-bounded Pallas medoid over D-major [M, 3, K] coords.

Everything is fixed-shape: points, masks and boxes are padded with validity
masks, so the whole keyframe step compiles once and `vmap`s/shards over a
keyframe batch.

Reference semantics notes (deliberate quirk reproduction — see SURVEY.md §7):
- Frustum test: depths > min_dist (NOT sqrt(min_dist); the sqrt only appears
  in the load-time close-point filter, 2d_to_3d.py:443-444 vs :598).
- In-image test is strict: 0 < px < W-1, 0 < py < H-1 on the *unfloored*
  pixel coordinates (2d_to_3d.py:597-605).
- The reference's `logical_and(floored_points, masked_pixels[...])`
  (2d_to_3d.py:608-613) implicitly drops points whose floored x or y is 0;
  reproduced via fx >= 1 & fy >= 1.
- Masks are indexed [x, y] (gen_2d_masks_detic.py:468); here bit-packed as
  words[x, y, m//32] bit (m%32).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cm3d_tpu.geometry.pointcloud import project_to_camera
from cm3d_tpu.ops.bitmask import erode3x3_packed, extract_bit
from cm3d_tpu.ops.medoid import masked_medoid_rows
from cm3d_tpu.ops.nms import circle_nms_keep
from cm3d_tpu.ops.pushback import push_centroid
from cm3d_tpu.ops.lanes import nearest_lane


@dataclasses.dataclass(frozen=True)
class LiftParams:
    """Static configuration of the lift step (hashable; safe as a jit static)."""

    min_dist: float = 2.3  # camera-frame depth cutoff (reference :348,598)
    max_points_per_mask: int = 2048  # K: per-mask compaction depth
    max_points_per_camera: int = 32768  # NC: per-camera compaction depth
    max_points_in_masks: int = 8192  # NU: per-camera any-mask union depth
    erode: bool = True  # reference erodes every mask 3x3 (:526-528)


# None = auto (Pallas compaction on TPU, top_k+gather elsewhere); tests can
# force True/False for on-chip A/B parity, or "interpret" to run the Pallas
# path through the interpreter on CPU (integration coverage off-chip).
_USE_PALLAS_COMPACT = None

# Fold xyz/ids/mask-words through the camera and union compactions as extra
# one-hot-matmul channels (camera D=5: xyz+flat+id; union D=4+2*Mw: xyz+id+
# 16-bit word halves, exact in the kernel's bf16 split), eliminating the
# flat/coord/word take_along_axis gathers AND the camera/union top_k sorts.
# Measured on the axon v5e at production scale (batch 8, interleaved runs
# one tunnel window): 135 -> 205 kf/s (61 -> 39 ms/batch), outputs
# bit-exact vs the unfolded path on chip. Requires the Pallas path.
# None = follow _USE_PALLAS_COMPACT's resolution (ON on TPU); False forces
# the top_k+gather stages even when the per-mask kernel is on.
#
# Batch envelope (r03 session-10/11 bisection, TPU_QUEUE_r03.log): batch
# 4/8 pass bit-exact; batch 16/32 reproducibly FAULTED the TPU worker in
# THIS fold path specifically — at batch 16 the XLA path runs (72 kf/s),
# the unfolded Pallas mask-stage kernel runs at 2048 folded rows
# (112.7 kf/s), and the medoid kernel is exonerated by both, so the fault
# is a Mosaic/XLA codegen bug in the folded camera/union compactions at
# >= 96 folded rows x >= 32768 sources. Since r04 the kernel AUTO-CHUNKS
# such calls into launches within the validated envelope (<= 80 rows
# since the r05 probe — compact_pallas._row_chunks), so batch 16/32 run
# correctly with the fold ON; batch 8 remains the measured throughput
# optimum (scripts/sweep_lift_batch.py).
_FOLD_CAMERA_UNION = None


class LiftOutputs(NamedTuple):
    centroids: jax.Array  # [M, 3] global-frame medoid per mask
    has_points: jax.Array  # [M] bool: mask produced a centroid
    point_counts: jax.Array  # [M] int32: points gathered (pre-truncation)
    truncated: jax.Array  # [M] bool: count exceeded K (silent loss in ref)
    cam_truncated: jax.Array  # [C] bool: a camera overflowed NC
    pca_yaws: jax.Array  # [M] BEV principal-axis yaw of the gathered points


def _compact_topk(sel: jax.Array, limit: int):
    """Order-preserving compaction of boolean rows.

    sel: [..., N] bool -> (ids [..., limit] int32 ascending positions of the
    first `limit` True entries, valid [..., limit] bool). Selected entries get
    strictly positive descending keys N-n, so top_k returns them in ascending
    position order with exact count semantics; TPU top_k is ~10x faster than
    the equivalent scatter-compaction.
    """
    n = sel.shape[-1]
    iota = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(sel, n - iota, -iota)
    vals, ids = jax.lax.top_k(key, limit)
    return ids.astype(jnp.int32), vals > 0


def lift_keyframe(
    points: jax.Array,
    point_valid: jax.Array,
    cam_ego_t: jax.Array,
    cam_ego_q: jax.Array,
    cam_t: jax.Array,
    cam_q: jax.Array,
    cam_intrinsics: jax.Array,
    mask_bits: jax.Array,
    mask_cam: jax.Array,
    mask_valid: jax.Array,
    params: LiftParams = LiftParams(),
) -> LiftOutputs:
    """Lift every 2D mask of one keyframe to a 3D centroid.

    Args:
      points: [N, D>=3] aggregated sweep points in the GLOBAL frame (padded).
      point_valid: [N] bool.
      cam_ego_t/[C,3], cam_ego_q/[C,4]: ego pose at each camera's timestamp.
      cam_t/[C,3], cam_q/[C,4]: camera extrinsics (sensor->ego).
      cam_intrinsics: [C,3,3], ALREADY scaled by the mask-resolution ratio
        with [2,2] reset to 1 (reference 2d_to_3d.py:585-587).
      mask_bits: [W, H, Mw] uint32 bit-packed instance masks (M <= Mw*32).
      mask_cam: [M] int32 camera index per mask.
      mask_valid: [M] bool.
    """
    m = mask_cam.shape[0]
    n = points.shape[0]
    # Compaction depths never need to exceed the prior stage's size.
    nc = min(params.max_points_per_camera, n)
    k = min(params.max_points_per_mask, nc)
    w, h, mw = mask_bits.shape
    assert m <= mw * 32, f"{m} masks need {-(-m // 32)} words, got {mw}"

    if params.erode:
        mask_bits = erode3x3_packed(mask_bits)

    pts_xyz = points[:, :3].astype(jnp.float32)

    # --- One projection per camera (C small; vmap over cameras). ---
    proj, depths = jax.vmap(
        lambda et, eq, ct, cq, intr: project_to_camera(
            pts_xyz, et, eq, ct, cq, intr, normalize=True
        )
    )(cam_ego_t, cam_ego_q, cam_t, cam_q, cam_intrinsics)
    # proj: [C, N, 3]; depths: [C, N]

    px, py = proj[..., 0], proj[..., 1]
    fx = jnp.floor(px).astype(jnp.int32)
    fy = jnp.floor(py).astype(jnp.int32)
    in_image = (
        point_valid[None, :]
        & (depths > params.min_dist)
        & (px > 0)
        & (px < w - 1)
        & (py > 0)
        & (py < h - 1)
        # Reference quirk: floored coordinate 0 is dropped by the logical_and.
        & (fx >= 1)
        & (fy >= 1)
    )  # [C, N]

    use_pallas = (
        jax.default_backend() == "tpu"
        if _USE_PALLAS_COMPACT is None else _USE_PALLAS_COMPACT
    )
    interp = _USE_PALLAS_COMPACT == "interpret"
    fold = bool(use_pallas) and (
        _FOLD_CAMERA_UNION is None or bool(_FOLD_CAMERA_UNION)
    )
    n_cams = cam_t.shape[0]
    n_in_image = jnp.sum(in_image, axis=1)  # [C]
    cam_truncated = n_in_image > nc
    flat_all = jnp.clip(fx, 0, w - 1) * h + jnp.clip(fy, 0, h - 1)  # [C, N]
    words_flat = mask_bits.reshape(w * h, mw)
    nu = min(params.max_points_in_masks, nc)
    k = min(k, nu)
    word_idx = (jnp.arange(m, dtype=jnp.int32) >> 5)  # [M]
    # Invalid masks (class outside the vocabulary, padding slots) keep
    # their bits in the packed planes; AND them out of every gathered
    # word so they can't consume union capacity (NU) or flip
    # cam_truncated — the reference never carries such masks into the
    # lift at all (gen_2d_masks writes only mapped classes).
    vbits = jnp.where(mask_valid, jnp.uint32(1), jnp.uint32(0)) << (
        jnp.arange(m, dtype=jnp.uint32) & jnp.uint32(31)
    )
    valid_words = (
        jnp.pad(vbits, (0, mw * 32 - m))
        .reshape(mw, 32)
        .sum(axis=1)
        .astype(jnp.uint32)
    )  # [Mw] (disjoint bits: sum == OR)

    if fold:
        from cm3d_tpu.kernels.compact_pallas import compact_rows_pallas

        # --- Per-camera compaction carrying xyz+flat+id (D=5): replaces
        # the top_k sort AND the flat/coord gathers that followed it.
        # flat < W*H and id < N are both < 2^24, exact through the
        # kernel's 3-way bf16 split. ---
        iota_n = jnp.arange(n, dtype=jnp.float32)
        vals_cam = jnp.concatenate(
            [
                jnp.broadcast_to(pts_xyz.T[None], (n_cams, 3, n)),
                flat_all.astype(jnp.float32)[:, None, :],
                jnp.broadcast_to(iota_n[None, None], (n_cams, 1, n)),
            ],
            axis=1,
        )  # [C, 5, N]
        out_c = compact_rows_pallas(in_image, vals_cam, nc, interpret=interp)
        xyz_c = out_c[:, :3]  # [C, 3, NC] D-major
        # invalid slots zero-fill -> flat 0, matching the unfolded path's
        # where(cam_ok, ., 0) (words_flat[0] junk is masked by cam_ok below)
        flat_c = out_c[:, 3].astype(jnp.int32)  # [C, NC]
        ids_c = out_c[:, 4]  # [C, NC] f32 point ids
        cam_ok = (
            jnp.arange(nc, dtype=jnp.int32)[None, :]
            < jnp.minimum(n_in_image, nc)[:, None]
        )

        # --- One word gather per (camera, compacted point) — inherent. ---
        wpts = words_flat[flat_c] & valid_words  # [C, NC, Mw]
        union = jnp.any(wpts != 0, axis=-1) & cam_ok  # [C, NC]
        cam_truncated = cam_truncated | (jnp.sum(union, axis=1) > nu)

        # --- Union compaction carrying xyz+id+word halves (D=4+2*Mw):
        # replaces the wpts/ids take_along_axis gathers. uint32 words
        # split into exact 16-bit halves (<= 65535 rides bf16*3). ---
        wpts_dm = jnp.moveaxis(wpts, -1, 1)  # [C, Mw, NC]
        lo = (wpts_dm & jnp.uint32(0xFFFF)).astype(jnp.float32)
        hi = (wpts_dm >> 16).astype(jnp.float32)
        vals_u = jnp.concatenate(
            [xyz_c, ids_c[:, None], lo, hi], axis=1
        )  # [C, 4 + 2*Mw, NC]
        out_u = compact_rows_pallas(union, vals_u, nu, interpret=interp)
        coords_u_dm = out_u[:, :3]  # [C, 3, NU]
        ids_u_f = out_u[:, 3]  # [C, NU]
        words_u_dm = (
            (out_u[:, 4 + mw :].astype(jnp.uint32) << 16)
            | out_u[:, 4 : 4 + mw].astype(jnp.uint32)
        )  # [C, Mw, NU] (zero at invalid slots — kernel zero-fill)

        # --- Per-mask bit test: [M, NU]. ---
        rows = words_u_dm[mask_cam, word_idx]  # [M, NU] uint32
        inmask = extract_bit(rows, jnp.arange(m, dtype=jnp.int32))
        sel = inmask & mask_valid[:, None]  # [M, NU]
        counts = jnp.sum(sel, axis=1).astype(jnp.int32)  # [M]
        has_points = (counts > 0) & mask_valid
        truncated = counts > k

        # --- Per-mask compaction NU -> K straight off the union output
        # (no pts_xyz[ids_u] gather: coords already rode the kernels). ---
        vals_c = jnp.concatenate(
            [coords_u_dm, ids_u_f[:, None]], axis=1
        )  # [C, 4, NU]
        out = compact_rows_pallas(
            sel, vals_c[mask_cam], k, interpret=interp
        )  # [M, 4, K]
        coords_dm = out[:, :3]  # [M, 3, K]
        idx_buf = out[:, 3].astype(jnp.int32)  # [M, K]
        valid_k = (
            jnp.arange(k, dtype=jnp.int32)[None, :]
            < jnp.minimum(counts, k)[:, None]
        )
        return _finish_lift(
            pts_xyz, coords_dm, idx_buf, valid_k, has_points, counts,
            truncated, cam_truncated,
        )

    # --- Per-camera compaction: indices of in-image points, order kept. ---
    cam_ids, cam_ok = _compact_topk(in_image, nc)  # [C, NC]

    flat_c = jnp.take_along_axis(flat_all, cam_ids, axis=1)  # [C, NC]
    flat_c = jnp.where(cam_ok, flat_c, 0)

    # --- One word gather per (camera, compacted point). ---
    wpts = words_flat[flat_c] & valid_words  # [C, NC, Mw]

    # --- Union compaction: only points under ANY mask bit go further. ---
    union = jnp.any(wpts != 0, axis=-1) & cam_ok  # [C, NC]
    u_pos, u_ok = _compact_topk(union, nu)  # [C, NU] into NC
    cam_truncated = cam_truncated | (jnp.sum(union, axis=1) > nu)
    wpts_u = jnp.take_along_axis(wpts, u_pos[..., None], axis=1)  # [C, NU, Mw]
    wpts_u = jnp.where(u_ok[..., None], wpts_u, jnp.uint32(0))
    ids_u = jnp.take_along_axis(cam_ids, u_pos, axis=1)  # [C, NU]

    # --- Per-mask bit test: [M, NU]. ---
    rows = wpts_u[mask_cam, :, word_idx]  # [M, NU] uint32
    inmask = extract_bit(rows, jnp.arange(m, dtype=jnp.int32))  # [M, NU]
    sel = inmask & mask_valid[:, None]  # [M, NU]

    counts = jnp.sum(sel, axis=1).astype(jnp.int32)  # [M]
    has_points = (counts > 0) & mask_valid
    truncated = counts > k

    # --- Per-mask compaction NU -> K (ascending order preserved). ---
    if use_pallas:
        # One Pallas one-hot-matmul compaction produces the compacted
        # coords AND ids directly (kernels/compact_pallas.py): the top_k +
        # two take_along_axis gathers it replaces were the step's largest
        # device cost (~44 ms/batch-8; TPU gathers run ~12 cycles/element).
        from cm3d_tpu.kernels.compact_pallas import compact_rows_pallas

        coords_u = pts_xyz[ids_u]  # [C, NU, 3] (small: C*NU rows)
        vals_c = jnp.concatenate(
            [
                jnp.moveaxis(coords_u, -1, 1),  # [C, 3, NU]
                ids_u[:, None, :].astype(jnp.float32),  # exact: N < 2^24
            ],
            axis=1,
        )  # [C, 4, NU]
        out = compact_rows_pallas(
            sel, vals_c[mask_cam], k,
            interpret=interp,
        )  # [M, 4, K]
        coords_dm = out[:, :3]  # [M, 3, K] — stays D-major end to end
        idx_buf = out[:, 3].astype(jnp.int32)  # [M, K] (0 at invalid slots)
        valid_k = (
            jnp.arange(k, dtype=jnp.int32)[None, :]
            < jnp.minimum(counts, k)[:, None]
        )
    else:
        pos_k, valid_k = _compact_topk(sel, k)  # [M, K] into NU
        ids_per_mask = ids_u[mask_cam]  # [M, NU] global point ids
        idx_buf = jnp.take_along_axis(ids_per_mask, pos_k, axis=1)  # [M, K]
        idx_buf = jnp.where(valid_k, idx_buf, 0)
        coords_dm = jnp.moveaxis(pts_xyz[idx_buf], -1, 1)  # [M, 3, K]

    return _finish_lift(
        pts_xyz, coords_dm, idx_buf, valid_k, has_points, counts,
        truncated, cam_truncated,
    )


def _finish_lift(pts_xyz, coords_dm, idx_buf, valid_k, has_points, counts,
                 truncated, cam_truncated) -> LiftOutputs:
    """Shared tail of lift_keyframe: medoid + BEV PCA yaw over the
    per-mask compacted D-major coords."""
    # --- Medoid per mask (reference get_medoid, 2d_to_3d.py:116-119). ---
    med_local = masked_medoid_rows(coords_dm, valid_k)  # [M]
    med_global = jnp.take_along_axis(idx_buf, med_local[:, None], axis=1)[:, 0]
    centroids = pts_xyz[med_global]
    centroids = jnp.where(has_points[:, None], centroids, 0.0)

    # --- BEV principal-axis yaw (device replacement for the reference
    # KITTI open3d OBB fit, kitti/2d_to_3d.py:855-876,1524; closed-form
    # eigenvector of the 2x2 xy covariance). ---
    vf = valid_k.astype(jnp.float32)[:, None, :]  # [M, 1, K]
    cnt = jnp.maximum(jnp.sum(vf[:, 0], axis=1), 1.0)
    xy = coords_dm[:, :2] * vf  # [M, 2, K]
    mean = jnp.sum(xy, axis=2) / cnt[:, None]
    d = (coords_dm[:, :2] - mean[..., None]) * vf
    sxx = jnp.sum(d[:, 0] * d[:, 0], axis=1)
    syy = jnp.sum(d[:, 1] * d[:, 1], axis=1)
    sxy = jnp.sum(d[:, 0] * d[:, 1], axis=1)
    pca_yaws = 0.5 * jnp.arctan2(2 * sxy, sxx - syy)

    return LiftOutputs(
        centroids, has_points, counts, truncated, cam_truncated, pca_yaws
    )


@dataclasses.dataclass(frozen=True)
class BoxParams:
    """Static configuration of box building (hashable; safe as a jit static).

    The two filters are the reference's commented-out blocks
    (2d_to_3d.py:756-758 object lane thresh, :774-779 drivable filtering,
    :782-785 vehicle lane thresh), off by default like the reference.
    """

    lane_dist_filter: bool = False
    object_lane_thresh: float = 20.0
    vehicle_lane_thresh: float = 4.0
    drivable_filter: bool = False
    drivable_resolution: float = 0.5  # meters per drivable-raster cell


class BoxOutputs(NamedTuple):
    centers: jax.Array  # [M, 3] final (possibly pushed-back) centers
    sizes: jax.Array  # [M, 3] (w, l, h) shape-prior extents
    yaws: jax.Array  # [M] box yaw (0 for non-vehicle classes)
    scores: jax.Array  # [M]
    labels: jax.Array  # [M] int32
    keep: jax.Array  # [M] bool: valid AND survived circle NMS
    lane_dist: jax.Array  # [M] distance to the nearest lane point


def build_boxes(
    centroids: jax.Array,
    has_points: jax.Array,
    labels: jax.Array,
    scores: jax.Array,
    lane_points: jax.Array,
    lane_valid: jax.Array,
    ego_translation: jax.Array,
    shape_priors: jax.Array,
    is_vehicle_class: jax.Array,
    nms_radius_sq: jax.Array,
    drivable_class: jax.Array | None = None,
    drivable_grid: jax.Array | None = None,
    drivable_origin: jax.Array | None = None,
    params: BoxParams = BoxParams(),
) -> BoxOutputs:
    """Pass 2 of the reference (2d_to_3d.py:733-825) + per-sample circle NMS.

    Args:
      centroids/[M,3], has_points/[M]: from `lift_keyframe`.
      labels: [M] int32 canonical class ids.
      scores: [M] detection scores.
      lane_points: [L, 3] (x, y, yaw); lane_valid: [L] bool.
      ego_translation: [3] LIDAR_TOP ego position at the keyframe.
      shape_priors: [num_classes, 3] (w, l, h) per class
        (cfg/shape_priors_chatgpt.json or the dataset-mean table).
      is_vehicle_class: [num_classes] bool — classes that get lane yaw +
        pushback (reference :763: car, truck, bus, construction_vehicle,
        trailer, barrier).
      nms_radius_sq: [num_classes] circle-NMS squared radii (:850-861).
      drivable_class: [num_classes] bool — classes the drivable filter drops
        (reference exempts construction_vehicle/trailer/barrier, :774-777).
      drivable_grid: [G, G] bool raster, indexed [ix, iy]; drivable_origin:
        [2] world xy of cell (0, 0). Required when params.drivable_filter.
        The reference tests the exact map polygons with shapely (:763-772);
        here a raster lookup at params.drivable_resolution — boundary cells
        differ by at most half a cell. Centroids outside the raster count as
        non-drivable.
    """
    yaw_raw, lane_dist, _ = nearest_lane(centroids[:, :2], lane_points, lane_valid)

    veh = is_vehicle_class[labels] & has_points
    sizes = shape_priors[labels]
    yaws = jnp.where(veh, yaw_raw, 0.0)

    pushed = push_centroid(centroids, sizes, yaws, ego_translation)
    centers = jnp.where(veh[:, None], pushed, centroids)

    # Both filters test the RAW medoid centroid (the reference filters before
    # pushback, :756-786) and drop boxes before circle NMS (continue skips
    # the append at :808).
    valid = has_points
    if params.lane_dist_filter:
        valid = valid & (lane_dist <= params.object_lane_thresh)
        valid = valid & (~veh | (lane_dist <= params.vehicle_lane_thresh))
    if params.drivable_filter:
        gx, gy = drivable_grid.shape
        inv_res = 1.0 / params.drivable_resolution
        ij = jnp.floor((centroids[:, :2] - drivable_origin[None, :]) * inv_res)
        ij = ij.astype(jnp.int32)
        in_grid = (
            (ij[:, 0] >= 0) & (ij[:, 0] < gx) & (ij[:, 1] >= 0) & (ij[:, 1] < gy)
        )
        cell = drivable_grid[
            jnp.clip(ij[:, 0], 0, gx - 1), jnp.clip(ij[:, 1], 0, gy - 1)
        ]
        on_road = in_grid & cell
        valid = valid & (~drivable_class[labels] | on_road)

    keep = circle_nms_keep(
        centers[:, :2], scores, labels, valid, nms_radius_sq
    )
    return BoxOutputs(centers, sizes, yaws, scores, labels, keep & valid, lane_dist)
