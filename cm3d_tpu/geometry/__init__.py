"""Geometry core: quaternions, SE(3) transforms, camera projection, boxes.

Pure JAX functions over fixed-shape arrays. This single module replaces the
reference's three per-dataset copies of `utils/pcd.py` and the torch-ified
KITTI `Calibration` class (reference: src/*/utils/pcd.py, src/kitti/kitti_utils.py).
"""

from cm3d_tpu.geometry.se3 import (
    quat_to_rotmat,
    rotmat_to_quat,
    yaw_to_quat,
    quat_to_yaw,
    quat_multiply,
    quat_inverse,
    transform_matrix,
    invert_se3,
    compose,
    apply_se3,
    yaw_rotmat,
)
from cm3d_tpu.geometry.pointcloud import (
    remove_close_mask,
    transform_points,
    rotate_points,
    translate_points,
    view_points,
    project_to_camera,
)
from cm3d_tpu.geometry.boxes import (
    box_corners_3d,
    box_corners_bev,
    boxes_to_7dof,
    rotated_iou_bev,
)

__all__ = [
    "quat_to_rotmat",
    "rotmat_to_quat",
    "yaw_to_quat",
    "quat_to_yaw",
    "quat_multiply",
    "quat_inverse",
    "transform_matrix",
    "invert_se3",
    "compose",
    "apply_se3",
    "yaw_rotmat",
    "remove_close_mask",
    "transform_points",
    "rotate_points",
    "translate_points",
    "view_points",
    "project_to_camera",
    "box_corners_3d",
    "box_corners_bev",
    "boxes_to_7dof",
    "rotated_iou_bev",
]
