"""nuScenes map-expansion access: drivable polygons + lane discretization.

Replaces the devkit NuScenesMap usage (reference 2d_to_3d.py:396-406,
get_all_lane_points_in_scene :228-240, eval_custom.py:496-529). Lane
geometry in the expansion is stored as arcline paths (shape strings over
L/S/R segments of constant curvature); discretization integrates poses
along them at a fixed resolution, devkit-equivalent.
"""

from __future__ import annotations

import json
import math
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np


def _segment_sign(shape: str) -> List[int]:
    return [{"L": 1, "S": 0, "R": -1}[c] for c in shape]


def _steer(pose, distance: float, sign: int, radius: float):
    """Advance a (x, y, yaw) pose `distance` meters along a segment."""
    x, y, yaw = pose
    if sign == 0 or radius <= 0:
        return (x + distance * math.cos(yaw), y + distance * math.sin(yaw), yaw)
    k = sign / radius
    new_yaw = yaw + k * distance
    x += (math.sin(new_yaw) - math.sin(yaw)) / k
    y += (math.cos(yaw) - math.cos(new_yaw)) / k
    return (x, y, new_yaw)


def pose_at_length(arcline_path: dict, s: float) -> Tuple[float, float, float]:
    """Pose at distance s along an arcline path (clamped to its length)."""
    lengths = arcline_path["segment_length"]
    signs = _segment_sign(arcline_path["shape"])
    radius = arcline_path["radius"]
    s = min(max(s, 0.0), sum(lengths))
    pose = tuple(arcline_path["start_pose"])
    for seg_len, sign in zip(lengths, signs):
        if s <= seg_len:
            return _steer(pose, s, sign, radius)
        pose = _steer(pose, seg_len, sign, radius)
        s -= seg_len
    return pose


def discretize(arcline_path: dict, resolution_meters: float) -> List[Tuple[float, float, float]]:
    """Devkit-equivalent sampling: n = max(ceil(L/res) + 1.5, 2) poses,
    evenly spaced from start to end inclusive."""
    length = sum(arcline_path["segment_length"])
    n_points = int(max(math.ceil(length / resolution_meters) + 1.5, 2))
    step = length / (n_points - 1)
    return [pose_at_length(arcline_path, i * step) for i in range(n_points)]


def discretize_lane(arcline_paths: List[dict], resolution_meters: float):
    out: List[Tuple[float, float, float]] = []
    for path in arcline_paths:
        out.extend(discretize(path, resolution_meters))
    return out


def rasterize_polygons(
    polygons: List[Tuple[np.ndarray, List[np.ndarray]]],
    origin: Tuple[float, float],
    shape: Tuple[int, int],
    resolution: float,
) -> np.ndarray:
    """Rasterize (exterior, holes) polygons onto a bool grid.

    Grid is indexed [ix, iy]; cell (ix, iy) covers world
    [origin + (ix, iy) * res, origin + (ix + 1, iy + 1) * res) and is sampled
    at its center. Even-odd scanline fill per polygon (holes XOR out), OR
    across polygons — matching the reference's "within any drivable polygon"
    shapely test (2d_to_3d.py:763-772) up to half-cell boundary error.
    """
    gx, gy = shape
    ox, oy = float(origin[0]), float(origin[1])
    grid = np.zeros((gx, gy), bool)
    cx = ox + (np.arange(gx) + 0.5) * resolution  # cell-center world x

    for exterior, holes in polygons:
        rings = [np.asarray(exterior, float)] + [np.asarray(h, float) for h in holes]
        allpts = np.concatenate(rings, axis=0)
        # Crop: skip polygons whose bbox misses the grid entirely.
        iy0 = max(0, int(np.floor((allpts[:, 1].min() - oy) / resolution)))
        iy1 = min(gy, int(np.ceil((allpts[:, 1].max() - oy) / resolution)))
        if iy0 >= iy1:
            continue
        ix0 = max(0, int(np.floor((allpts[:, 0].min() - ox) / resolution)))
        ix1 = min(gx, int(np.ceil((allpts[:, 0].max() - ox) / resolution)))
        if ix0 >= ix1:
            continue
        edges = []
        for ring in rings:
            p1 = ring
            p2 = np.roll(ring, -1, axis=0)
            keep = p1[:, 1] != p2[:, 1]  # horizontal edges never cross a row
            edges.append((p1[keep], p2[keep]))
        for iy in range(iy0, iy1):
            y = oy + (iy + 0.5) * resolution
            xs_list = []
            for p1, p2 in edges:
                hit = (p1[:, 1] <= y) != (p2[:, 1] <= y)
                if not hit.any():
                    continue
                a, b = p1[hit], p2[hit]
                t = (y - a[:, 1]) / (b[:, 1] - a[:, 1])
                xs_list.append(a[:, 0] + t * (b[:, 0] - a[:, 0]))
            if not xs_list:
                continue
            xs = np.sort(np.concatenate(xs_list))
            inside = (
                np.searchsorted(xs, cx[ix0:ix1], side="right") % 2
            ).astype(bool)
            grid[ix0:ix1, iy] |= inside
    return grid


class NuScenesMapLite:
    """Subset of the devkit NuScenesMap the pipeline needs."""

    def __init__(self, dataroot: str | Path, map_name: str):
        p = Path(dataroot) / "maps" / "expansion" / f"{map_name}.json"
        data = json.loads(p.read_text())
        # core layers fail LOUDLY when absent (same convention as
        # tables.py): a truncated/schema-shifted expansion JSON silently
        # defaulting to [] meant an all-False drivable grid that filtered
        # every box, and zero lanes for the yaw assignment
        missing = [k for k in ("node", "polygon", "drivable_area", "lane",
                               "lane_connector", "arcline_path_3")
                   if k not in data]
        if missing:
            raise KeyError(
                f"{p}: map expansion JSON is missing layer(s) {missing} — "
                "truncated download or wrong schema version (need the "
                "nuScenes map expansion v1.3 layout)"
            )
        self._nodes = {n["token"]: (n["x"], n["y"]) for n in data["node"]}
        self._polygons = {q["token"]: q for q in data["polygon"]}
        self.drivable_area = data["drivable_area"]
        self.lane = data["lane"]
        self.lane_connector = data["lane_connector"]
        self.arcline_path_3: Dict[str, List[dict]] = data["arcline_path_3"]

    def extract_polygon(self, token: str):
        """(exterior [N,2], [hole [M,2], ...]) arrays for a polygon record."""
        rec = self._polygons[token]
        ext = np.array([self._nodes[t] for t in rec["exterior_node_tokens"]], float)
        holes = [
            np.array([self._nodes[t] for t in h["node_tokens"]], float)
            for h in rec.get("holes", [])
        ]
        return ext, holes

    def drivable_polygons(self):
        out = []
        for rec in self.drivable_area:
            for tok in rec["polygon_tokens"]:
                out.append(self.extract_polygon(tok))
        return out

    def discretize_lanes(
        self, tokens: List[str], resolution_meters: float
    ) -> Dict[str, List[Tuple[float, float, float]]]:
        return {
            t: discretize_lane(self.arcline_path_3.get(t, []), resolution_meters)
            for t in tokens
        }

    def all_lane_points(self, resolution_meters: float = 0.5) -> np.ndarray:
        """Flattened (x, y, yaw) over lanes + lane connectors (reference
        get_all_lane_points_in_scene, 2d_to_3d.py:228-240)."""
        tokens = [r["token"] for r in self.lane + self.lane_connector]
        pts: List[Tuple[float, float, float]] = []
        for lane_pts in self.discretize_lanes(tokens, resolution_meters).values():
            pts.extend(lane_pts)
        if not pts:
            return np.zeros((0, 3), np.float32)
        return np.asarray(pts, np.float32)
