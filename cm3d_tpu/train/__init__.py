"""Pseudo-label pretraining: a CenterPoint-style LiDAR detector on TPU.

BASELINE config 5 (the stretch target): CM3D pseudo-labels feed
semi-supervised detector pretraining. This package provides the TPU-native
training loop — pillar voxelization, a conv BEV backbone with center-heatmap
heads, penalty-reduced focal + L1 losses, and a jittable optax train step
that shards batch-parallel over the device mesh.
"""

from cm3d_tpu.train.voxelize import pillarize, PillarConfig
from cm3d_tpu.train.centerpoint import CenterPointConfig, CenterPointDetector
from cm3d_tpu.train.targets import build_targets
from cm3d_tpu.train.train import (
    TrainState,
    decode_detections,
    make_optimizer,
    make_train_step,
)
from cm3d_tpu.train.augment import AugmentConfig

__all__ = [
    "pillarize",
    "PillarConfig",
    "CenterPointConfig",
    "CenterPointDetector",
    "build_targets",
    "TrainState",
    "make_optimizer",
    "make_train_step",
    "decode_detections",
    "AugmentConfig",
]
