"""Waymo Open Dataset frontend (TF-free).

Replaces the reference's tensorflow + waymo_open_dataset dependency stack
(src/waymo/2d_to_3d.py:336-348): a native TFRecord reader/writer, a minimal
protobuf wire codec for the detection-metrics messages, a JAX range-image
unprojection kernel, and keyframe builders feeding the same device step as
nuScenes.
"""

from cm3d_tpu.datasets.waymo.tfrecord import TFRecordReader, TFRecordWriter
from cm3d_tpu.datasets.waymo.proto import (
    WaymoBox,
    WaymoObject,
    decode_objects,
    encode_objects,
    LABEL_TYPE_VEHICLE,
    LABEL_TYPE_PEDESTRIAN,
    LABEL_TYPE_SIGN,
    LABEL_TYPE_CYCLIST,
)

__all__ = [
    "TFRecordReader",
    "TFRecordWriter",
    "WaymoBox",
    "WaymoObject",
    "decode_objects",
    "encode_objects",
    "LABEL_TYPE_VEHICLE",
    "LABEL_TYPE_PEDESTRIAN",
    "LABEL_TYPE_SIGN",
    "LABEL_TYPE_CYCLIST",
]
