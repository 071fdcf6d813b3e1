"""Hermetic synthetic dataset: fake scenes with known geometry.

The reference can only run against 300 GB of nuScenes/Waymo data; this
frontend fabricates calibrated scenes (ground-truth boxes -> point clusters
-> pixel masks) so the FULL pipeline runs and is benchmarked with zero data
dependencies (SURVEY.md §4's "fake in-memory dataset frontend").
"""

from __future__ import annotations

import dataclasses

import numpy as np

from cm3d_tpu.config import NUSCENES_CLASSES, LiftStageConfig
from cm3d_tpu.datasets.types import CameraParams, Keyframe
from cm3d_tpu.ops.bitmask import pack_masks_np


def _yaw_quat(yaw: float) -> np.ndarray:
    return np.array([np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)], np.float32)


@dataclasses.dataclass
class SyntheticConfig:
    num_cameras: int = 6
    image_w: int = 1024
    image_h: int = 576
    points_per_frame: int = 100_000
    objects_per_frame: int = 40
    focal: float = 810.0  # ~ nuScenes 1266 * 0.64
    seed: int = 0


def make_keyframe(
    cfg: SyntheticConfig, lift_cfg: LiftStageConfig, rng: np.random.Generator
) -> Keyframe:
    """One synthetic keyframe at realistic nuScenes scale."""
    c = cfg.num_cameras
    ego_t = rng.uniform(-500, 500, 3).astype(np.float32)
    ego_t[2] = 0.0
    ego_yaw = rng.uniform(-np.pi, np.pi)

    # Cameras: ring of headings, z-forward optical frame.
    cam_ego_t = np.tile(ego_t, (c, 1)).astype(np.float32)
    cam_ego_q = np.tile(_yaw_quat(ego_yaw), (c, 1))
    cam_t = np.tile(np.array([1.0, 0.0, 1.6], np.float32), (c, 1))
    axes_swap = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32)
    cam_q = np.zeros((c, 4), np.float32)
    from scipy.spatial.transform import Rotation as R

    for i in range(c):
        heading = 2 * np.pi * i / c
        rot = R.from_euler("z", heading).as_matrix().astype(np.float32) @ axes_swap
        q = R.from_matrix(rot).as_quat()
        cam_q[i] = np.roll(q, 1)
    intr = np.zeros((c, 3, 3), np.float32)
    intr[:, 0, 0] = cfg.focal
    intr[:, 1, 1] = cfg.focal
    intr[:, 0, 2] = cfg.image_w / 2
    intr[:, 1, 2] = cfg.image_h / 2
    intr[:, 2, 2] = 1.0

    # Background points (ground plane + clutter) in global frame near ego.
    n = lift_cfg.max_points
    n_real = min(cfg.points_per_frame, n)
    bg = rng.uniform([-60, -60, -1.8], [60, 60, 3.0], size=(n_real, 3))
    bg += ego_t

    # Objects: clusters that we also paint as masks.
    m_pad = lift_cfg.max_masks
    n_obj = min(cfg.objects_per_frame, m_pad)
    masks = np.zeros((m_pad, cfg.image_w, cfg.image_h), bool)
    mask_cam = np.zeros(m_pad, np.int32)
    mask_label = np.zeros(m_pad, np.int32)
    mask_score = np.zeros(m_pad, np.float32)
    mask_valid = np.zeros(m_pad, bool)

    ego_rot = _rotmat_z(ego_yaw)
    pts_extra = []
    for j in range(n_obj):
        cam_idx = int(rng.integers(0, c))
        heading = 2 * np.pi * cam_idx / c
        # object placed in front of that camera, in ego frame
        dist = rng.uniform(8, 45)
        lateral = rng.uniform(-0.3, 0.3) * dist
        height = rng.uniform(0.2, 1.0)
        local = np.array(
            [dist * np.cos(heading) - lateral * np.sin(heading),
             dist * np.sin(heading) + lateral * np.cos(heading),
             height]
        )
        center = ego_rot @ local + ego_t
        npts = int(rng.integers(30, 400))
        cluster = center + rng.normal(0, 0.5, size=(npts, 3))
        pts_extra.append(cluster)

        # paint an elliptical mask around the projected center
        px, py = _project_one(center, ego_t, ego_yaw, cam_t[cam_idx], cam_q[cam_idx], intr[cam_idx])
        if not (2 < px < cfg.image_w - 2 and 2 < py < cfg.image_h - 2):
            continue
        rx = int(np.clip(1500.0 / dist, 6, 120))
        ry = int(np.clip(1000.0 / dist, 6, 90))
        xs = np.arange(cfg.image_w)[:, None]
        ys = np.arange(cfg.image_h)[None, :]
        masks[j] = ((xs - px) / rx) ** 2 + ((ys - py) / ry) ** 2 <= 1.0
        mask_cam[j] = cam_idx
        mask_label[j] = int(rng.integers(0, len(NUSCENES_CLASSES)))
        mask_score[j] = rng.uniform(0.1, 1.0)
        mask_valid[j] = True

    pts = np.concatenate([bg] + pts_extra, axis=0)[:n]
    n_valid = pts.shape[0]
    points = np.zeros((n, 4), np.float32)
    points[:n_valid, :3] = pts
    points[:n_valid, 3] = rng.random(n_valid)
    point_valid = np.zeros(n, bool)
    point_valid[:n_valid] = True

    # Lanes: a grid of lane points with smooth yaws around ego.
    l_pad = lift_cfg.max_lane_points
    n_lane = min(4096, l_pad)
    lane_xy = rng.uniform(-80, 80, size=(n_lane, 2)) + ego_t[:2]
    lane_yaw = rng.uniform(-np.pi, np.pi, size=(n_lane, 1))
    lane_points = np.zeros((l_pad, 3), np.float32)
    lane_points[:n_lane] = np.concatenate([lane_xy, lane_yaw], axis=1)
    lane_valid = np.zeros(l_pad, bool)
    lane_valid[:n_lane] = True

    return Keyframe(
        points=points,
        point_valid=point_valid,
        cameras=CameraParams(cam_ego_t, cam_ego_q, cam_t, cam_q, intr),
        mask_bits=pack_masks_np(masks),
        mask_cam=mask_cam,
        mask_label=mask_label,
        mask_score=mask_score,
        mask_valid=mask_valid,
        lane_points=lane_points,
        lane_valid=lane_valid,
        ego_translation=ego_t,
    )


def _rotmat_z(yaw: float) -> np.ndarray:
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def _project_one(p_global, ego_t, ego_yaw, cam_t, cam_q, intr):
    from scipy.spatial.transform import Rotation as R

    p = p_global - ego_t
    p = _rotmat_z(ego_yaw).T @ p
    p = p - cam_t
    rot = R.from_quat(np.roll(cam_q, -1)).as_matrix()
    p = rot.T @ p
    if p[2] <= 0.1:
        return -1, -1
    uvw = intr @ p
    return uvw[0] / uvw[2], uvw[1] / uvw[2]
