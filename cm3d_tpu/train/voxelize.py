"""Pillar voxelization (PointPillars-style) as fixed-shape JAX.

Points scatter into a BEV grid with per-pillar mean/max feature
aggregation — pure scatter-reduce, so it jits with static shapes (no
per-pillar point lists; the point-count distribution never shows up in the
compiled program). TPU note: XLA lowers the scatters to sorted segment
reductions; at 100k points this is training-scale cheap.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PillarConfig:
    x_min: float = -51.2
    x_max: float = 51.2
    y_min: float = -51.2
    y_max: float = 51.2
    z_min: float = -5.0
    z_max: float = 3.0
    resolution: float = 0.8  # pillar edge in meters

    @property
    def grid_hw(self):
        h = int(round((self.x_max - self.x_min) / self.resolution))
        w = int(round((self.y_max - self.y_min) / self.resolution))
        return h, w

    # feature channels: mean xyz offset-from-pillar-center, mean intensity,
    # max z, log count
    num_features: int = 6


def pillarize(points: jax.Array, valid: jax.Array, cfg: PillarConfig):
    """[N, 4] ego-frame points -> [H, W, F] pillar features.

    Out-of-range or invalid points drop out via a sink cell.
    """
    h, w = cfg.grid_hw
    xy = points[:, :2]
    z = points[:, 2]
    intensity = points[:, 3] if points.shape[1] > 3 else jnp.zeros_like(z)

    ix = jnp.floor((xy[:, 0] - cfg.x_min) / cfg.resolution).astype(jnp.int32)
    iy = jnp.floor((xy[:, 1] - cfg.y_min) / cfg.resolution).astype(jnp.int32)
    in_range = (
        valid
        & (ix >= 0) & (ix < h) & (iy >= 0) & (iy < w)
        & (z > cfg.z_min) & (z < cfg.z_max)
    )
    cell = jnp.where(in_range, ix * w + iy, h * w)  # sink = h*w

    n_cells = h * w + 1
    ones = in_range.astype(jnp.float32)
    count = jnp.zeros(n_cells).at[cell].add(ones)
    cnt = jnp.maximum(count, 1.0)

    cx = (ix.astype(jnp.float32) + 0.5) * cfg.resolution + cfg.x_min
    cy = (iy.astype(jnp.float32) + 0.5) * cfg.resolution + cfg.y_min
    dx = jnp.where(in_range, xy[:, 0] - cx, 0.0)
    dy = jnp.where(in_range, xy[:, 1] - cy, 0.0)
    zz = jnp.where(in_range, z, 0.0)
    ii = jnp.where(in_range, intensity, 0.0)

    sum_feats = jnp.zeros((n_cells, 4))
    sum_feats = sum_feats.at[cell].add(jnp.stack([dx, dy, zz, ii], axis=1))
    mean_feats = sum_feats / cnt[:, None]

    max_z = jnp.full(n_cells, cfg.z_min).at[cell].max(
        jnp.where(in_range, z, cfg.z_min)
    )

    feats = jnp.concatenate(
        [
            mean_feats,
            max_z[:, None],
            jnp.log1p(count)[:, None],
        ],
        axis=1,
    )[: h * w]
    return feats.reshape(h, w, cfg.num_features)
