"""Dataset frontends: everything normalizes to a canonical KeyframeBatch."""

from cm3d_tpu.datasets.types import CameraParams, KeyframeBatch, Keyframe

__all__ = ["CameraParams", "KeyframeBatch", "Keyframe"]
