"""Plain-numpy oracle reproducing the reference pipeline's semantics.

Written from the behavioral contract of src/nuscenes/2d_to_3d.py (see
SURVEY.md §3.2), used as ground truth for the JAX implementation. Kept
deliberately loop-heavy/naive — clarity over speed.
"""

import numpy as np
from scipy.spatial.transform import Rotation as R


def quat_wxyz_to_mat(q):
    return R.from_quat(np.roll(np.asarray(q, np.float64), -1)).as_matrix()


def view_points_np(points_3xn, view, normalize=True):
    viewpad = np.eye(4)
    viewpad[: view.shape[0], : view.shape[1]] = view
    n = points_3xn.shape[1]
    homog = np.concatenate([points_3xn, np.ones((1, n))])
    proj = (viewpad @ homog)[:3]
    depths = proj[2].copy()
    if normalize:
        proj = proj / proj[2:3]
    return proj, depths


def lift_mask_oracle(
    points_global,  # [N, >=3] (all valid)
    mask_wh,  # [W, H] bool, already eroded if erosion on
    ego_t,
    ego_q,
    cam_t,
    cam_q,
    intrinsics,  # already ratio-scaled, [2,2]=1
    min_dist=2.3,
):
    """Returns (selected_indices, medoid_global_index, centroid) for ONE mask.

    Reproduces reference 2d_to_3d.py:553-647: transform chain, strict
    in-image window, floor quirk (floored 0-pixels dropped), medoid via
    full cdist sum argmin.
    """
    pts = points_global[:, :3].astype(np.float64)
    p = pts - np.asarray(ego_t)
    p = p @ quat_wxyz_to_mat(ego_q)  # (R^T @ p.T).T == p @ R
    p = p - np.asarray(cam_t)
    p = p @ quat_wxyz_to_mat(cam_q)

    proj, depths = view_points_np(p.T, np.asarray(intrinsics, np.float64))
    w, h = mask_wh.shape

    within = (
        (depths > min_dist)
        & (proj[0] > 0)
        & (proj[0] < w - 1)
        & (proj[1] > 0)
        & (proj[1] < h - 1)
    )
    idx_within = np.where(within)[0]
    fx = np.floor(proj[0, within]).astype(int)
    fy = np.floor(proj[1, within]).astype(int)
    # reference quirk: logical_and(floored_points, mask_val) drops floor==0
    inmask = mask_wh[fx, fy] & (fx >= 1) & (fy >= 1)
    selected = idx_within[inmask]
    if len(selected) == 0:
        return selected, -1, None

    sel_pts = pts[selected]
    dists = np.sqrt(((sel_pts[:, None, :] - sel_pts[None, :, :]) ** 2).sum(-1))
    med_local = int(np.argmin(dists.sum(axis=0)))
    med_global = int(selected[med_local])
    return selected, med_global, pts[med_global]


def push_centroid_oracle(centroid, extents, lane_yaw, av_centroid):
    """Literal transcription of reference push_centroid (2d_to_3d.py:164-198),
    including the scipy euler round trip and the w/l swap."""
    centroid = np.squeeze(np.asarray(centroid, np.float64))
    ego_centroid = centroid - np.asarray(av_centroid, np.float64)

    l = extents[0]
    w = extents[1]

    # Quaternion(matrix=align_mat) for yaw rotation -> [cos(y/2), 0, 0, sin(y/2)]
    quat_wxyz = [np.cos(lane_yaw / 2), 0.0, 0.0, np.sin(lane_yaw / 2)]
    # reference feeds (w,x,y,z) straight into scipy's (x,y,z,w) slot:
    angle = R.from_quat(quat_wxyz).as_euler("xyz", degrees=False)
    theta = -angle[0]
    if np.isnan(theta):
        theta = 0.5 * np.pi

    alpha = np.arctan(np.abs(ego_centroid[1]) / np.abs(ego_centroid[0]))
    if ego_centroid[0] < 0:
        alpha = (-np.pi + alpha) if ego_centroid[1] < 0 else (np.pi - alpha)
    else:
        if ego_centroid[1] < 0:
            alpha = -alpha

    offset = np.min(
        [np.abs(w / (2 * np.sin(theta - alpha))), np.abs(l / (2 * np.cos(theta - alpha)))]
    )
    return np.array(
        [
            centroid[0] + offset * np.cos(alpha),
            centroid[1] + offset * np.sin(alpha),
            centroid[2],
        ]
    )


def circle_nms_oracle(dets, det_labels, threshs_by_label):
    """Reference circle_nms (2d_to_3d.py:309-332) with a STABLE descending
    sort (the reference's unstable argsort makes ties implementation-defined)."""
    x1 = dets[:, 0]
    y1 = dets[:, 1]
    scores = dets[:, 2]
    order = np.argsort(-scores, kind="stable").astype(np.int32)
    ndets = dets.shape[0]
    suppressed = np.zeros(ndets, dtype=np.int32)
    keep = []
    for _i in range(ndets):
        i = order[_i]
        if suppressed[i] == 1:
            continue
        keep.append(i)
        for _j in range(_i + 1, ndets):
            j = order[_j]
            if suppressed[j] == 1:
                continue
            dist = (x1[i] - x1[j]) ** 2 + (y1[i] - y1[j]) ** 2
            if dist <= threshs_by_label[det_labels[j]] and det_labels[j] == det_labels[i]:
                suppressed[j] = 1
    return keep
