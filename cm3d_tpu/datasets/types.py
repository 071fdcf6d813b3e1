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

# Placeholder drivable raster for frontends/configs with drivable_filter off:
# a single non-drivable cell (build_boxes statically skips the lookup).
_NO_DRIVABLE_GRID = np.zeros((1, 1), bool)
_NO_DRIVABLE_GRID.setflags(write=False)
_ZERO2 = np.zeros(2, np.float32)
_ZERO2.setflags(write=False)


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
    # Rasterized drivable area around ego (used only when
    # LiftStageConfig.drivable_filter; placeholders otherwise). Grid is
    # indexed [ix, iy] with world xy = origin + (i + 0.5) * resolution
    # (resolution is static config, not carried here).
    drivable_grid: jax.Array = _NO_DRIVABLE_GRID  # [G, G] bool
    drivable_origin: jax.Array = _ZERO2  # [2] world xy of cell (0, 0) corner


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
