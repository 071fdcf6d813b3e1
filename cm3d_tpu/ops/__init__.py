"""Device-side ops for the lifting pipeline (pure JAX, fixed shapes)."""

from cm3d_tpu.ops.erosion import erode3x3
from cm3d_tpu.ops.medoid import medoid_index, masked_medoid
from cm3d_tpu.ops.nms import circle_nms_keep, nms_2d_classwise
from cm3d_tpu.ops.pushback import push_centroid
from cm3d_tpu.ops.lanes import nearest_lane
from cm3d_tpu.ops.lift import lift_keyframe, LiftParams

__all__ = [
    "erode3x3",
    "medoid_index",
    "masked_medoid",
    "circle_nms_keep",
    "nms_2d_classwise",
    "push_centroid",
    "nearest_lane",
    "lift_keyframe",
    "LiftParams",
]
