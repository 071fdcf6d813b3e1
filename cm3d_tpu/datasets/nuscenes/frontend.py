"""nuScenes keyframe builder: tables + sweeps + mask artifacts -> Keyframe.

Host-side work is I/O and tiny numpy transforms only; everything heavy runs
in the jitted device step. Reference semantics reproduced:

- 3-sweep LiDAR aggregation in the global frame, chained via sample_data
  `next` (2d_to_3d.py:437-465); the sweep loop stops at the chain end.
- Load-time close-point filter drops points with |x| AND |y| <
  sqrt(min_dist) — the reference's sqrt quirk (:443-444); the projection
  stage separately uses depth > min_dist (reproduced on device).
- Intrinsics scaled by the mask-resolution ratio with [2,2] reset to 1
  (:585-587). nuScenes images are 1600x900; masks come from 1024-thumbnail
  images, hence ratio 0.64 and 1024x576 mask grids.
- Camera order = CAM_LIST (:60-67); mask arrays indexed [x, y].
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from cm3d_tpu.config import CLASS_TO_ID, DETECTION_NAME_FIXUPS, LiftStageConfig
from cm3d_tpu.datasets.artifacts import MaskArtifactStore
from cm3d_tpu.datasets.nuscenes.maps import NuScenesMapLite, rasterize_polygons
from cm3d_tpu.datasets.nuscenes.tables import CAM_LIST, NuScenesTables
from cm3d_tpu.datasets.types import CameraParams, Keyframe
from cm3d_tpu.ops.bitmask import num_words


def get_detection_name(label: str) -> str:
    """Reference get_detection_name (2d_to_3d.py:122-132)."""
    return DETECTION_NAME_FIXUPS.get(label, label)


def _quat_to_mat(q) -> np.ndarray:
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        np.float64,
    )


def load_sweep_bin(path: Path) -> np.ndarray:
    """LIDAR_TOP .bin: float32 x 5 (x, y, z, intensity, ring) -> [N, 4]."""
    raw = np.fromfile(path, dtype=np.float32).reshape(-1, 5)
    return raw[:, :4]


@dataclasses.dataclass
class KeyframeMeta:
    sample_token: str
    scene_name: str
    frame_num: int
    num_masks: int


class NuScenesFrontend:
    def __init__(
        self,
        dataroot: str | Path,
        version: str,
        mask_store: MaskArtifactStore,
        lift_cfg: LiftStageConfig = LiftStageConfig(),
        mask_wh: Tuple[int, int] = (1024, 576),
        tables: NuScenesTables | None = None,
    ):
        self.nusc = tables if tables is not None else NuScenesTables(dataroot, version)
        self.dataroot = Path(dataroot)
        self.store = mask_store
        self.cfg = lift_cfg
        self.mask_wh = mask_wh
        self._maps: Dict[str, NuScenesMapLite] = {}
        self._drivable: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}

    def _map_for_scene(self, scene: dict) -> NuScenesMapLite:
        location = self.nusc.scene_location(scene)
        if location not in self._maps:
            self._maps[location] = NuScenesMapLite(self.dataroot, location)
        return self._maps[location]

    def drivable_for_scene(self, scene: dict) -> Tuple[np.ndarray, np.ndarray]:
        """Per-scene drivable raster covering the ego trajectory plus a
        G/2-cell margin on every side (so any per-keyframe GxG crop centered
        on ego stays in bounds). Returns (grid [gx, gy] bool, origin [2])."""
        key = scene["token"]
        if key not in self._drivable:
            cfg = self.cfg
            res = cfg.drivable_resolution
            half = cfg.drivable_grid_size // 2
            poses = [
                self.nusc.sample_lidar_ego_pose(s)["translation"][:2]
                for s in self.nusc.iter_samples(scene)
            ]
            traj = np.asarray(poses, np.float64)
            lo = np.floor(traj.min(axis=0) / res).astype(np.int64) - half
            hi = np.ceil(traj.max(axis=0) / res).astype(np.int64) + half
            origin = lo.astype(np.float64) * res
            shape = (int(hi[0] - lo[0]), int(hi[1] - lo[1]))
            nmap = self._map_for_scene(scene)
            grid = rasterize_polygons(
                nmap.drivable_polygons(), tuple(origin), shape, res
            )
            self._drivable[key] = (grid, origin.astype(np.float32))
        return self._drivable[key]

    def _crop_drivable(
        self, scene_raster: Tuple[np.ndarray, np.ndarray], ego_xy: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """GxG cell-aligned crop centered on ego -> (grid, crop origin)."""
        grid, origin = scene_raster
        g = self.cfg.drivable_grid_size
        res = self.cfg.drivable_resolution
        ix = int(np.floor((ego_xy[0] - origin[0]) / res)) - g // 2
        iy = int(np.floor((ego_xy[1] - origin[1]) / res)) - g // 2
        ix = max(0, min(ix, grid.shape[0] - g))
        iy = max(0, min(iy, grid.shape[1] - g))
        crop = grid[ix : ix + g, iy : iy + g]
        crop_origin = np.asarray(
            [origin[0] + ix * res, origin[1] + iy * res], np.float32
        )
        return crop, crop_origin

    # -- sweeps --------------------------------------------------------------

    def aggregate_sweeps(self, sample: dict) -> np.ndarray:
        """[N, 4] aggregated global-frame points (reference :437-465)."""
        nusc = self.nusc
        sd = nusc.get("sample_data", sample["data"]["LIDAR_TOP"])
        sweeps = []
        for _ in range(self.cfg.num_sweeps):
            pts = load_sweep_bin(self.dataroot / sd["filename"])
            if self.cfg.sqrt_min_dist_load_filter:
                close = (np.abs(pts[:, 0]) < np.sqrt(self.cfg.min_dist)) & (
                    np.abs(pts[:, 1]) < np.sqrt(self.cfg.min_dist)
                )
                pts = pts[~close]
            cs = nusc.get("calibrated_sensor", sd["calibrated_sensor_token"])
            pose = nusc.get("ego_pose", sd["ego_pose_token"])
            xyz = pts[:, :3].astype(np.float64)
            xyz = xyz @ _quat_to_mat(cs["rotation"]).T + np.asarray(cs["translation"])
            xyz = xyz @ _quat_to_mat(pose["rotation"]).T + np.asarray(pose["translation"])
            out = pts.copy()
            out[:, :3] = xyz.astype(np.float32)
            sweeps.append(out)
            if sd["next"] == "":
                break
            sd = nusc.get("sample_data", sd["next"])
        return np.concatenate(sweeps, axis=0)

    # -- cameras --------------------------------------------------------------

    def camera_params(self, sample: dict) -> CameraParams:
        nusc = self.nusc
        ego_t, ego_q, cam_t, cam_q, intr = [], [], [], [], []
        ratio = self.cfg.image_ratio
        for cam in CAM_LIST:
            sd = nusc.get("sample_data", sample["data"][cam])
            pose = nusc.get("ego_pose", sd["ego_pose_token"])
            cs = nusc.get("calibrated_sensor", sd["calibrated_sensor_token"])
            ego_t.append(pose["translation"])
            ego_q.append(pose["rotation"])
            cam_t.append(cs["translation"])
            cam_q.append(cs["rotation"])
            k = np.asarray(cs["camera_intrinsic"], np.float32) * ratio
            k[2, 2] = 1.0  # reference :585-587
            intr.append(k)
        return CameraParams(
            ego_translation=np.asarray(ego_t, np.float32),
            ego_rotation=np.asarray(ego_q, np.float32),
            cam_translation=np.asarray(cam_t, np.float32),
            cam_rotation=np.asarray(cam_q, np.float32),
            intrinsics=np.stack(intr),
        )

    # -- keyframes --------------------------------------------------------------

    def build_keyframe(
        self,
        scene_name: str,
        frame_num: int,
        sample: dict,
        lane_points: np.ndarray,
        drivable: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    ) -> Optional[Tuple[Keyframe, KeyframeMeta]]:
        """Assemble one padded Keyframe; None if mask artifacts are missing."""
        packed = self.store.read_frame_packed(
            scene_name, frame_num, num_words(self.cfg.max_masks), self.mask_wh
        )
        if packed is None:
            return None
        return self.assemble_keyframe(
            scene_name, frame_num, sample, lane_points, packed, drivable
        )

    def assemble_keyframe(
        self,
        scene_name: str,
        frame_num: int,
        sample: dict,
        lane_points: np.ndarray,
        packed: Tuple,
        drivable: Optional[Tuple[np.ndarray, np.ndarray]] = None,
        points: Optional[np.ndarray] = None,
    ) -> Tuple[Keyframe, KeyframeMeta]:
        """Build a Keyframe from already-materialized mask data — either the
        artifact store's packed read or the mask stage's device bit-planes
        (the fused masks->lift path, no artifact round trip).

        packed: (labels [M] str, scores [M], cams [M], mask_bits
        [W, H, ceil(max_masks/32)] uint32).
        points: optional pre-aggregated sweep points (aggregate_sweeps
        output) — the fused pipeline loads them on its IO worker so this
        call (main thread) never blocks on point-file IO.
        """
        cfg = self.cfg
        m_pad = cfg.max_masks
        labels_raw, scores_raw, cams_raw, mask_bits = packed

        pts = points if points is not None else self.aggregate_sweeps(sample)
        n = cfg.max_points
        points = np.zeros((n, 4), np.float32)
        point_valid = np.zeros(n, bool)
        n_real = min(len(pts), n)
        points[:n_real] = pts[:n_real]
        point_valid[:n_real] = True

        m_real = min(len(labels_raw), m_pad)
        mask_cam = np.zeros(m_pad, np.int32)
        mask_label = np.zeros(m_pad, np.int32)
        mask_score = np.zeros(m_pad, np.float32)
        mask_valid = np.zeros(m_pad, bool)
        for i in range(m_real):
            name = get_detection_name(labels_raw[i])
            if name not in CLASS_TO_ID:
                # bit stays set in the packed planes; the lift ANDs
                # invalid masks' bits out of every gathered word
                # (ops/lift.py valid_words) so they can't consume union
                # capacity, and mask_valid gates the box outputs
                continue
            mask_cam[i] = cams_raw[i]
            mask_label[i] = CLASS_TO_ID[name]
            mask_score[i] = scores_raw[i]
            mask_valid[i] = True

        l_pad = cfg.max_lane_points
        lanes = np.zeros((l_pad, 3), np.float32)
        lane_valid = np.zeros(l_pad, bool)
        l_real = min(len(lane_points), l_pad)
        lanes[:l_real] = lane_points[:l_real]
        lane_valid[:l_real] = True

        pose = self.nusc.sample_lidar_ego_pose(sample)
        ego_t = np.asarray(pose["translation"], np.float32)
        drv_kwargs = {}
        if drivable is not None:
            grid, origin = self._crop_drivable(drivable, ego_t[:2])
            drv_kwargs = dict(
                drivable_grid=grid, drivable_origin=origin
            )
        kf = Keyframe(
            points=points,
            point_valid=point_valid,
            cameras=self.camera_params(sample),
            mask_bits=mask_bits,
            mask_cam=mask_cam,
            mask_label=mask_label,
            mask_score=mask_score,
            mask_valid=mask_valid,
            lane_points=lanes,
            lane_valid=lane_valid,
            ego_translation=ego_t,
            **drv_kwargs,
        )
        meta = KeyframeMeta(sample["token"], scene_name, frame_num, m_real)
        return kf, meta

    def iter_scene(self, scene_name: str) -> Iterator[Tuple[Keyframe, KeyframeMeta]]:
        """Yield keyframes of a scene with its map's lane points attached."""
        scene = self.nusc.scene_by_name(scene_name)
        nmap = self._map_for_scene(scene)
        lane_points = nmap.all_lane_points(0.5)
        drivable = (
            self.drivable_for_scene(scene) if self.cfg.drivable_filter else None
        )
        for frame_num, sample in enumerate(self.nusc.iter_samples(scene)):
            built = self.build_keyframe(
                scene_name, frame_num, sample, lane_points, drivable
            )
            if built is None:
                continue
            yield built
