"""Pallas TPU kernel: masked pairwise-L2 distance sums (the medoid inner loop).

The reference computes `torch.cdist(P.T, P.T).sum(axis=0)` per mask in a
Python loop (src/nuscenes/2d_to_3d.py:116-119). Here one kernel program per
mask streams row tiles of the [K, K] distance matrix through VMEM — the
matrix is never materialized in HBM — with exact fp32 VPU arithmetic
(per-dimension differences, no |a|^2+|b|^2-2ab cancellation), so results
bit-match the numpy/torch oracle.

Layout: coordinates arrive once, lane-major [R, 3, K] (the compaction
kernel's native output); column broadcasts come from in-kernel
[1, TILE] -> [TILE, 1] relayouts of its slices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cm3d_tpu.kernels.compact_pallas import broadcast_unbatched as _bc

_TILE = 256  # row tile; [TILE, K] fp32 working set stays well under VMEM


def _medoid_sums_kernel(count_ref, row_ref, valid_ref, out_ref):
    """One program = one mask.

    count_ref: [R] int32 valid counts (scalar prefetch; compaction keeps all
        valid points in the leading `count` slots, so row tiles beyond the
        count need no sums and column lanes beyond it contribute zero).
    row_ref: [1, 3, K] coords, lane-major — the ONLY coordinate operand;
        column broadcasts come from in-kernel [1, TILE] -> [TILE, 1]
        relayouts of its slices (the old sublane-major [K, 3] twin operand
        cost an XLA transpose + copy per call).
    valid_ref: [1, 1, K] float32 0/1.
    out_ref: [1, 1, K] distance sums (garbage at invalid rows).
    """
    k = row_ref.shape[2]
    x_row = row_ref[0, 0, :].reshape(1, k)
    y_row = row_ref[0, 1, :].reshape(1, k)
    z_row = row_ref[0, 2, :].reshape(1, k)
    v_row = valid_ref[0]  # [1, K]

    out_ref[0, 0, :] = jnp.zeros((k,), out_ref.dtype)
    count = count_ref[pl.program_id(0)]
    n_tiles = jnp.minimum(pl.cdiv(count, _TILE), k // _TILE)

    def tile_body(i, _):
        def col(dim):
            # ref slice (pl.ds) — Mosaic has no value-level dynamic_slice
            return row_ref[0, dim, pl.ds(i * _TILE, _TILE)].reshape(_TILE, 1)

        xc, yc, zc = col(0), col(1), col(2)
        dx = xc - x_row
        dy = yc - y_row
        dz = zc - z_row
        d2 = dx * dx + dy * dy + dz * dz  # [TILE, K]
        sums = jnp.sum(jnp.sqrt(d2) * v_row, axis=1)  # [TILE]
        out_ref[0, 0, pl.ds(i * _TILE, _TILE)] = sums
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0, unroll=False)


@functools.lru_cache(maxsize=None)
def _medoid_vmappable(interpret: bool):
    """vmap folds the mapped axis into R (default pallas batching scans the
    batch in an XLA while — measured ~2x the kernel's own time)."""

    @jax.custom_batching.custom_vmap
    def f(points, valid):
        return _medoid_sums_impl(points, valid, interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, points, valid):
        points = _bc(points, in_batched[0], axis_size)
        valid = _bc(valid, in_batched[1], axis_size)
        b, r, k, _ = points.shape
        out = f(points.reshape(b * r, k, 3), valid.reshape(b * r, k))
        return out.reshape(b, r, k), True

    return f


def medoid_distance_sums_pallas(
    points: jax.Array, valid: jax.Array, interpret: bool = False
) -> jax.Array:
    """Distance sums for batched masked point sets (vmap folds into R).

    Args:
      points: [R, K, 3] float32 coordinates (padding rows arbitrary but
        finite). Valid rows MUST be compacted to the front (the lift's
        order-preserving top_k guarantees this) — the kernel skips row tiles
        beyond each set's count.
      valid: [R, K] bool.

    Returns [R, K] float32: sum_j valid_j * ||p_i - p_j|| (rows at invalid i
    are zero/garbage; mask them before argmin).
    """
    return _medoid_vmappable(bool(interpret))(points, valid)


def _medoid_sums_impl(points, valid, interpret):
    rows = jnp.transpose(points.astype(jnp.float32), (0, 2, 1))  # [R, 3, K]
    return _medoid_sums_rows_impl(rows, valid, interpret)


@functools.lru_cache(maxsize=None)
def _medoid_rows_vmappable(interpret: bool):
    @jax.custom_batching.custom_vmap
    def f(rows, valid):
        return _medoid_sums_rows_impl(rows, valid, interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, rows, valid):
        rows = _bc(rows, in_batched[0], axis_size)
        valid = _bc(valid, in_batched[1], axis_size)
        b, r, _, k = rows.shape
        out = f(rows.reshape(b * r, 3, k), valid.reshape(b * r, k))
        return out.reshape(b, r, k), True

    return f


def medoid_distance_sums_rows_pallas(
    rows: jax.Array, valid: jax.Array, interpret: bool = False
) -> jax.Array:
    """Distance sums from D-major coords [R, 3, K] — the layout the Pallas
    compaction emits, so no [R, K, 3] intermediate ever materializes."""
    return _medoid_rows_vmappable(bool(interpret))(rows, valid)


def _medoid_sums_rows_impl(rows, valid, interpret):
    r, three, k = rows.shape
    assert three == 3
    pad_k = -(-k // _TILE) * _TILE
    if pad_k != k:
        rows = jnp.pad(rows, ((0, 0), (0, 0), (0, pad_k - k)))
        valid = jnp.pad(valid, ((0, 0), (0, pad_k - k)))

    # Zero invalid coords so padded rows can't produce inf/nan.
    rows = rows.astype(jnp.float32) * valid[:, None, :].astype(jnp.float32)
    validf = valid.astype(jnp.float32)[:, None, :]  # [R, 1, K]
    counts = jnp.sum(valid, axis=1).astype(jnp.int32)  # [R]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, 3, pad_k), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, 1, pad_k), lambda i, c: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, pad_k), lambda i, c: (i, 0, 0)),
    )
    out = pl.pallas_call(
        _medoid_sums_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, 1, pad_k), jnp.float32),
        interpret=interpret,
    )(counts, rows, validf)
    return out[:, 0, :k]
