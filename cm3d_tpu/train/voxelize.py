"""Pillar voxelization (PointPillars-style) as fixed-shape JAX.

Points reduce into a BEV grid with per-pillar mean/max feature
aggregation. On TPU the scatter-reduce formulation is the training step's
bottleneck (XLA lowers .at[].add/.max to ~12 cycles/element — 36 of 39
ms/step at batch-8 x 131k points), so the TPU path sorts points by cell id
(jax.lax.sort carries the feature columns) and runs the Pallas segment
sum+max kernel (kernels/segment_pallas.py) — same values up to f32
addition order. Other backends keep the scatter formulation.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

# None = auto (Pallas segment reduce on TPU); tests can force True/False or
# "interpret" (Pallas interpreter on CPU).
_USE_PALLAS_SEGMENT = None


def segment_kernel_mode() -> tuple:
    """Resolve the _USE_PALLAS_SEGMENT tri-state for every segment-reduce
    call site (pillarize here, splat_to_bev in bevfusion) -> (use_pallas,
    interpret). One decision point: a new override value or backend gate
    changes both paths together."""
    use = (
        jax.default_backend() == "tpu"
        if _USE_PALLAS_SEGMENT is None
        else bool(_USE_PALLAS_SEGMENT)
    )
    return use, _USE_PALLAS_SEGMENT == "interpret"


@jax.custom_vjp
def apply_permutation(vals: jax.Array, perm: jax.Array,
                      inv_perm: jax.Array) -> jax.Array:
    """vals[perm] with an exact gather VJP (perm must be a bijection).

    XLA transposes a differentiated gather into a scatter-add
    (~12 cycles/element on TPU) — at the camera splat's 83k x 32 f32
    rows per sample that backward scatter alone costs ~250 ms of the
    268 ms batch-8 fusion train step. For a PERMUTATION the cotangent of
    vals[perm] is exactly ct[inv_perm]: another cheap row gather. The
    caller supplies inv_perm (one extra lax.sort of (perm, iota) — the
    same recipe that produced perm, still scatter-free).
    """
    del inv_perm
    return vals[perm]


def _apply_permutation_fwd(vals, perm, inv_perm):
    return vals[perm], inv_perm


def _apply_permutation_bwd(inv_perm, ct):
    import numpy as np

    f0 = np.zeros(inv_perm.shape, dtype=jax.dtypes.float0)
    return ct[inv_perm], f0, f0


apply_permutation.defvjp(_apply_permutation_fwd, _apply_permutation_bwd)


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

    cx = (ix.astype(jnp.float32) + 0.5) * cfg.resolution + cfg.x_min
    cy = (iy.astype(jnp.float32) + 0.5) * cfg.resolution + cfg.y_min
    dx = jnp.where(in_range, xy[:, 0] - cx, 0.0)
    dy = jnp.where(in_range, xy[:, 1] - cy, 0.0)
    zz = jnp.where(in_range, z, 0.0)
    ii = jnp.where(in_range, intensity, 0.0)

    use_pallas, interpret = segment_kernel_mode()
    if use_pallas:
        from cm3d_tpu.kernels.segment_pallas import segment_sum_max_pallas

        cell_s, dx_s, dy_s, zz_s, ii_s, ones_s = jax.lax.sort(
            (cell, dx, dy, zz, ii, ones), num_keys=1
        )
        # the max channel is just z masked by in_range — derived after the
        # sort instead of riding it as a seventh operand
        zm_s = jnp.where(ones_s > 0, zz_s, -jnp.inf)
        vals = jnp.stack([dx_s, dy_s, zz_s, ii_s, ones_s], axis=0)  # [5, N]
        sums, maxs = segment_sum_max_pallas(
            cell_s[None], vals[None], zm_s[None], n_cells,
            interpret=interpret,
        )
        sums, maxs = sums[0], maxs[0]  # [5, n_cells], [n_cells]
        count = sums[4]
        mean_feats = (sums[:4] / jnp.maximum(count, 1.0)[None, :]).T
        max_z = jnp.maximum(maxs, cfg.z_min)
    else:
        count = jnp.zeros(n_cells).at[cell].add(ones)
        sum_feats = jnp.zeros((n_cells, 4))
        sum_feats = sum_feats.at[cell].add(
            jnp.stack([dx, dy, zz, ii], axis=1)
        )
        mean_feats = sum_feats / jnp.maximum(count, 1.0)[:, None]
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
