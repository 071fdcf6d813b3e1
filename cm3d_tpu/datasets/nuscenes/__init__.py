"""nuScenes dataset frontend (devkit-free).

Reads the v1.0 relational JSON tables, the map expansion, and raw LiDAR
sweeps directly — replacing the reference's nuscenes-devkit dependency
(src/nuscenes/2d_to_3d.py:34-43) — and normalizes every keyframe to the
canonical `Keyframe` consumed by the jitted device step.
"""

from cm3d_tpu.datasets.nuscenes.tables import NuScenesTables, CAM_LIST
from cm3d_tpu.datasets.nuscenes.maps import NuScenesMapLite
from cm3d_tpu.datasets.nuscenes.frontend import NuScenesFrontend
from cm3d_tpu.datasets.nuscenes.writer import SubmissionWriter, boxes_to_dicts
from cm3d_tpu.datasets.nuscenes.gt import load_gt_for_eval

__all__ = [
    "NuScenesTables",
    "CAM_LIST",
    "NuScenesMapLite",
    "NuScenesFrontend",
    "SubmissionWriter",
    "boxes_to_dicts",
    "load_gt_for_eval",
]
