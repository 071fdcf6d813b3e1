"""CenterPoint-style BEV detector in Flax (compact trunk, center heads).

Heads follow CenterPoint: per-class center heatmap (sigmoid focal), and
dense regression maps — sub-pillar offset (2), z (1), log sizes (3),
yaw (sin, cos). Everything convolutional and static-shape; bf16-friendly.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import flax.linen as nn


@dataclasses.dataclass(frozen=True)
class CenterPointConfig:
    num_classes: int = 10
    trunk_channels: Tuple[int, ...] = (64, 128, 128)
    head_channels: int = 64
    out_stride: int = 2  # heatmap stride relative to the pillar grid

    def __post_init__(self):
        # Only trunk block 0 strides, so the network can realize at most
        # stride 2 — but build_targets and decode_detections trust this
        # value as-is (a mismatch misprojects every decoded box).
        if self.out_stride not in (1, 2):
            raise ValueError(
                "out_stride must be 1 or 2 (the trunk downsamples at most "
                f"once); got {self.out_stride}"
            )


class ConvBlock(nn.Module):
    ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.ch, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99)(x)
        return nn.relu(x)


class CenterPointDetector(nn.Module):
    cfg: CenterPointConfig = CenterPointConfig()

    @nn.compact
    def __call__(self, pillars: jax.Array, train: bool = False):
        """pillars: [B, H, W, F] -> dict of dense head maps at H/stride."""
        cfg = self.cfg
        x = pillars
        for i, ch in enumerate(cfg.trunk_channels):
            stride = 2 if (i == 0 and cfg.out_stride > 1) else 1
            x = ConvBlock(ch, stride, name=f"trunk{i}_a")(x, train)
            x = ConvBlock(ch, 1, name=f"trunk{i}_b")(x, train)

        def head(ch_out, name, bias_init=0.0):
            y = nn.Conv(cfg.head_channels, (3, 3), padding=1,
                        name=f"{name}_conv")(x)
            y = nn.relu(y)
            return nn.Conv(
                ch_out, (1, 1), name=f"{name}_out",
                bias_init=nn.initializers.constant(bias_init),
            )(y)

        return {
            # -4.6 bias: sigmoid ~ 0.01 at init (CenterNet convention)
            "heatmap": head(cfg.num_classes, "heatmap", bias_init=-4.6),
            "offset": head(2, "offset"),
            "z": head(1, "z"),
            "size": head(3, "size"),  # log(w), log(l), log(h)
            "yaw": head(2, "yaw"),  # sin, cos
        }
