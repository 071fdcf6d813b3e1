"""Canonical keyframe structures — the contract between dataset frontends
and the device pipeline.

The reference hand-forks its whole pipeline per dataset (SURVEY.md §1); here
every frontend (nuScenes / Waymo / KITTI / synthetic) produces the same
fixed-shape `Keyframe`, so the jitted lift step compiles once and shards over
a keyframe-batch mesh axis.

All arrays are padded to the static sizes in `LiftStageConfig` and carry
validity masks. Keyframe is a pytree (flax.struct-style NamedTuples keep it
dependency-light).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import numpy as np


class CameraParams(NamedTuple):
    """Per-camera calibration at the keyframe. Leading dim C = num cameras."""

    ego_translation: jax.Array  # [C, 3] ego pose at camera timestamp
    ego_rotation: jax.Array  # [C, 4] quaternion (w, x, y, z)
    cam_translation: jax.Array  # [C, 3] sensor->ego extrinsic
    cam_rotation: jax.Array  # [C, 4]
    intrinsics: jax.Array  # [C, 3, 3] ALREADY ratio-scaled, [2,2] = 1


class Keyframe(NamedTuple):
    """One keyframe's device-ready inputs (single sample; batch via stacking)."""

    points: jax.Array  # [N, 4] aggregated sweeps, GLOBAL frame
    point_valid: jax.Array  # [N] bool
    cameras: CameraParams
    mask_bits: jax.Array  # [W, H, ceil(M/32)] uint32 bit-packed masks, [x, y]
    mask_cam: jax.Array  # [M] int32
    mask_label: jax.Array  # [M] int32 canonical class id
    mask_score: jax.Array  # [M] float32
    mask_valid: jax.Array  # [M] bool
    lane_points: jax.Array  # [L, 3] (x, y, yaw), scene map prior
    lane_valid: jax.Array  # [L] bool
    ego_translation: jax.Array  # [3] LIDAR_TOP ego position at the keyframe


class KeyframeBatch(NamedTuple):
    """A stacked batch of keyframes: every leaf gains a leading B dim."""

    frames: Keyframe

    @property
    def batch_size(self) -> int:
        return self.frames.points.shape[0]


def stack_keyframes(frames: list[Keyframe]) -> KeyframeBatch:
    """Stack host-side keyframes into a batch (numpy, no device transfer)."""
    stacked = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *frames)
    return KeyframeBatch(frames=stacked)
