"""Submission JSON writer: device BoxOutputs -> nuScenes results format.

Reference schema (2d_to_3d.py:806-822, meta :357-365): per-box dict with
translation/size/rotation(yaw quaternion)/velocity [0,0]/detection_name/
detection_score/fixed attribute_name; NMS already applied (our device step's
`keep` flags replace the reference's host circle_nms pass :844-907).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np

from cm3d_tpu.config import ATTRIBUTE_NAMES, NUSCENES_CLASSES

SUBMISSION_META = {
    "use_camera": True,
    "use_lidar": False,
    "use_radar": False,
    "use_map": True,
    "use_external": False,
}


def boxes_to_dicts(
    sample_token: str,
    centers: np.ndarray,  # [M, 3]
    sizes: np.ndarray,  # [M, 3] (w, l, h)
    yaws: np.ndarray,  # [M]
    scores: np.ndarray,  # [M]
    labels: np.ndarray,  # [M] int32 class ids
    keep: np.ndarray,  # [M] bool
    classes=NUSCENES_CLASSES,
) -> List[dict]:
    out = []
    for i in np.flatnonzero(np.asarray(keep)):
        name = classes[int(labels[i])]
        yaw = float(yaws[i])
        out.append(
            {
                "sample_token": sample_token,
                "translation": [float(v) for v in centers[i]],
                "size": [float(v) for v in sizes[i]],
                "rotation": [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))],
                "velocity": [0, 0],  # reference always writes zeros (:813)
                "detection_name": name,
                "detection_score": float(scores[i]),
                "attribute_name": ATTRIBUTE_NAMES[name],
            }
        )
    return out


class SubmissionWriter:
    """Accumulates per-sample box dicts and writes the submission JSON."""

    def __init__(self) -> None:
        self.results: Dict[str, List[dict]] = {}

    def add_sample(self, sample_token: str, box_dicts: List[dict]) -> None:
        self.results.setdefault(sample_token, []).extend(box_dicts)

    def add_device_outputs(self, sample_token: str, boxes) -> None:
        """boxes: a BoxOutputs pytree (single frame, numpy-convertible)."""
        self.add_sample(
            sample_token,
            boxes_to_dicts(
                sample_token,
                np.asarray(boxes.centers),
                np.asarray(boxes.sizes),
                np.asarray(boxes.yaws),
                np.asarray(boxes.scores),
                np.asarray(boxes.labels),
                np.asarray(boxes.keep),
            ),
        )

    def write(self, path: str) -> dict:
        submission = {"meta": dict(SUBMISSION_META), "results": self.results}
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(submission, f)
        return submission
