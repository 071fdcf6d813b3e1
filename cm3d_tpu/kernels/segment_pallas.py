"""Pallas TPU kernel: segment sum+max over SORTED cell ids (voxelization).

The PointPillars scatter (train/voxelize.py) dominated the training step:
XLA lowers the .at[cell].add/.max scatters to ~12 cycles/element loops —
36 of 39 ms/step at batch-8 x 131k points. Here points are first sorted by
cell id (jax.lax.sort carries the value columns, no reorder gather), which
makes the per-cell reduction a MONOTONE one-hot contraction — the same
tiled `values @ (cell == l)` MXU pattern as kernels/compact_pallas.py,
except one-hot columns now carry MULTIPLE ones (the matmul performs the
segment SUM) plus a compare-masked running max for the z channel.
Chunk-skipping bounds come from the sorted cells' chunk-edge values.

Exactness: each product is value x 1.0 via the in-kernel 3-way bf16 split
(see compact_pallas.py — the split must live inside the kernel, XLA's
excess-precision folding elides it outside), so sums differ from the
scatter path only by f32 addition order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cm3d_tpu.kernels.compact_pallas import (
    _vmem_params,
    broadcast_unbatched as _bc,
    check_interpret_backend,
    split3_bf16,
)

_L_T = 512
_S_T = 2048
_RB = 8


def _segment_kernel(lo_ref, hi_ref, cell_ref, vals_ref, *rest,
                    d, l_t, s_t, rb, has_max):
    """One program = `rb` rows.

    lo_ref/hi_ref: scalar-prefetch [R * n_ltiles] int32 chunk ranges.
    cell_ref: [rb, 1, N] int32 NON-DECREASING (sink id sorts last).
    vals_ref: [rb, D, N] f32 (zeroed at invalid rows).
    has_max adds mx_ref [rb, 1, N] and max_ref [rb, 1, L] (-inf at empty
    cells) around sum_ref [rb, D, L]; the sum-only variant (the
    differentiable training path) skips the whole max stream — one fewer
    [R, N] f32 HBM stream plus the per-tile masked-max VPU pass.
    """
    if has_max:
        mx_ref, sum_ref, max_ref = rest
    else:
        (sum_ref,) = rest
    r0 = pl.program_id(0) * rb
    n_ltiles = sum_ref.shape[2] // l_t
    for j in range(rb):
        for lt in range(n_ltiles):
            l0 = lt * l_t
            lr = l0 + jax.lax.broadcasted_iota(jnp.int32, (1, l_t), 1)

            def body(ci, acc, j=j, lr=lr):
                # the sum-only variant carries ONLY the sum accumulator —
                # a dead -inf max slot in the loop carry is state Mosaic
                # may not DCE through the fori_loop
                acc_s, acc_m = acc if has_max else (acc, None)
                cchunk = cell_ref[j, 0, pl.ds(ci * s_t, s_t)].reshape(s_t, 1)
                oh = (cchunk == lr)  # [s_t, l_t] bool
                ohb = oh.astype(jnp.bfloat16)
                vf = vals_ref[j, :, pl.ds(ci * s_t, s_t)]  # [d, s_t] f32
                v3 = split3_bf16(vf)  # [3d, s_t]
                acc_s = acc_s + jax.lax.dot_general(
                    v3, ohb, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if not has_max:
                    return acc_s
                zc = mx_ref[j, 0, pl.ds(ci * s_t, s_t)].reshape(s_t, 1)
                masked = jnp.where(oh, zc, -jnp.inf)  # [s_t, l_t]
                acc_m = jnp.maximum(acc_m, jnp.max(masked, axis=0))
                return acc_s, acc_m

            init_s = jnp.zeros((3 * d, l_t), jnp.float32)
            acc = jax.lax.fori_loop(
                lo_ref[(r0 + j) * n_ltiles + lt],
                hi_ref[(r0 + j) * n_ltiles + lt],
                body,
                (init_s, jnp.full((l_t,), -jnp.inf, jnp.float32))
                if has_max else init_s,
            )
            acc_s, acc_m = acc if has_max else (acc, None)
            sum_ref[j, :, pl.ds(l0, l_t)] = (
                acc_s[:d] + acc_s[d : 2 * d] + acc_s[2 * d :]
            )
            if has_max:
                max_ref[j, 0, pl.ds(l0, l_t)] = acc_m


@functools.lru_cache(maxsize=None)
def _segment_vmappable(n_cells: int, interpret: bool):
    @jax.custom_batching.custom_vmap
    def f(cell, values, maxvals):
        return _segment_impl(cell, values, maxvals, n_cells, interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, cell, values, maxvals):
        cell = _bc(cell, in_batched[0], axis_size)
        values = _bc(values, in_batched[1], axis_size)
        maxvals = _bc(maxvals, in_batched[2], axis_size)
        b, r, n = cell.shape
        d = values.shape[2]
        s, m = f(
            cell.reshape(b * r, n),
            values.reshape(b * r, d, n),
            maxvals.reshape(b * r, n),
        )
        return (s.reshape(b, r, d, n_cells), m.reshape(b, r, n_cells)), (True, True)

    return f


@functools.lru_cache(maxsize=None)
def _segment_sum_vmappable(n_cells: int, interpret: bool):
    @jax.custom_batching.custom_vmap
    def f(cell, values):
        return _segment_impl(cell, values, None, n_cells, interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, cell, values):
        cell = _bc(cell, in_batched[0], axis_size)
        values = _bc(values, in_batched[1], axis_size)
        b, r, n = cell.shape
        d = values.shape[2]
        s = f(cell.reshape(b * r, n), values.reshape(b * r, d, n))
        return s.reshape(b, r, d, n_cells), True

    return f


def segment_sum_max_pallas(
    cell: jax.Array,     # [R, N] int32, NON-DECREASING per row
    values: jax.Array,   # [R, D, N] f32 (zero at rows to ignore)
    maxvals: jax.Array,  # [R, N] f32 (the max channel; -inf to ignore)
    n_cells: int,
    interpret: bool = False,
):
    """Returns (sums [R, D, n_cells] f32, maxs [R, n_cells] f32).

    sums[r, :, c] = sum of values[r, :, i] over i with cell[r, i] == c;
    maxs[r, c] = max of maxvals (empty cells -> -inf). Ids >= n_cells act
    as a sink (they sort to the end and never match an output column).
    """
    check_interpret_backend(interpret)
    return _segment_vmappable(int(n_cells), bool(interpret))(
        cell, values, maxvals
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def segment_sum_pallas(cell: jax.Array, values: jax.Array, n_cells: int,
                       interpret: bool = False) -> jax.Array:
    """Differentiable sum-only wrapper: [R, N] sorted cells + [R, D, N]
    values -> [R, D, n_cells] sums. The pallas_call itself has no AD rule
    (pillarize never differentiates through it — pillars don't depend on
    params), but the camera splat (train/bevfusion.py) trains THROUGH the
    reduction, so this wrapper supplies the exact VJP: the transpose of a
    segment-sum over fixed cells is the per-element gather of the cell's
    cotangent (one row gather, same cost class as the forward sort).

    Runs the sum-only kernel variant: no -inf max stream is materialized,
    streamed, or reduced (it was pure waste in the training inner loop)."""
    check_interpret_backend(interpret)
    return _segment_sum_vmappable(int(n_cells), bool(interpret))(
        cell, values
    )


def _segment_sum_fwd(cell, values, n_cells, interpret):
    return segment_sum_pallas(cell, values, n_cells, interpret), cell


def _segment_sum_bwd(n_cells, interpret, cell, g):
    # g: [R, D, n_cells]; sink ids (>= n_cells) must read a zero cotangent.
    # Orient the cotangent table row-major ([n_cells+1, D]) and gather
    # ROWS by cell id: TPU gather cost tracks INDEX ROWS (~12 cycles/row),
    # while the take_along_axis form with broadcast [R, D, N] indices is
    # costed per ELEMENT — measured as ~the whole isolated splat backward
    # (321 ms at batch-8 x 83k x 32; the camera splat trains through this).
    gz = jnp.concatenate([g, jnp.zeros(g.shape[:2] + (1,), g.dtype)], axis=2)
    gzt = jnp.swapaxes(gz, 1, 2)  # [R, n_cells + 1, D]
    safe = jnp.minimum(cell, n_cells)  # [R, N]
    rows = jax.vmap(lambda t, i: t[i])(gzt, safe)  # [R, N, D] row gather
    dvalues = jnp.swapaxes(rows, 1, 2)  # [R, D, N]
    import numpy as np

    # integer primal -> float0 cotangent (custom_vjp contract)
    return np.zeros(cell.shape, dtype=jax.dtypes.float0), dvalues


segment_sum_pallas.defvjp(_segment_sum_fwd, _segment_sum_bwd)


def _segment_impl(cell, values, maxvals, n_cells, interpret):
    """maxvals=None runs the sum-only kernel variant and returns just sums
    (the differentiable training path); otherwise returns (sums, maxs)."""
    has_max = maxvals is not None
    r, n = cell.shape
    d = values.shape[1]
    s_t = min(_S_T, n)
    # dynamic lane-dim slice offsets (ci * s_t) are only Mosaic-legal when
    # 128-aligned; round the chunk up — the padding below absorbs it
    s_t = -(-s_t // 128) * 128
    if n % s_t:
        pad = s_t - n % s_t
        big = jnp.full((r, pad), jnp.int32(2**30))
        cell = jnp.concatenate([cell, big], axis=1)
        values = jnp.pad(values, ((0, 0), (0, 0), (0, pad)))
        if has_max:
            maxvals = jnp.pad(maxvals, ((0, 0), (0, pad)),
                              constant_values=-jnp.inf)
        n += pad
    out_cells = n_cells
    l_t = min(_L_T, n_cells)
    limit = n_cells + (l_t - n_cells % l_t) % l_t
    n_chunks = n // s_t
    n_ltiles = limit // l_t

    starts = cell[:, ::s_t]  # [R, n_chunks] first cell of each chunk
    ends = cell[:, s_t - 1 :: s_t]  # last cell of each chunk
    l0s = jnp.arange(n_ltiles, dtype=jnp.int32) * l_t
    lo = jnp.sum(ends[:, None, :] < l0s[None, :, None], axis=2).astype(jnp.int32)
    hi = jnp.sum(
        starts[:, None, :] < (l0s + l_t)[None, :, None], axis=2
    ).astype(jnp.int32)
    hi = jnp.minimum(hi, n_chunks)

    row_bytes = (
        (d + 1 + has_max) * n * 4 + (d + has_max) * limit * 4
    )
    rb = max(1, min(_RB, (4 << 20) // max(row_bytes, 1)))
    while rb > 1 and r % rb:
        rb -= 1

    in_specs = [
        pl.BlockSpec((rb, 1, n), lambda i, lo, hi: (i, 0, 0)),
        pl.BlockSpec((rb, d, n), lambda i, lo, hi: (i, 0, 0)),
    ]
    out_specs = [pl.BlockSpec((rb, d, limit), lambda i, lo, hi: (i, 0, 0))]
    out_shape = [jax.ShapeDtypeStruct((r, d, limit), jnp.float32)]
    operands = [lo.reshape(-1), hi.reshape(-1), cell[:, None, :],
                values.astype(jnp.float32)]
    if has_max:
        in_specs.append(pl.BlockSpec((rb, 1, n), lambda i, lo, hi: (i, 0, 0)))
        out_specs.append(
            pl.BlockSpec((rb, 1, limit), lambda i, lo, hi: (i, 0, 0))
        )
        out_shape.append(jax.ShapeDtypeStruct((r, 1, limit), jnp.float32))
        operands.append(maxvals[:, None, :].astype(jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(r // rb,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    res = pl.pallas_call(
        functools.partial(_segment_kernel, d=d, l_t=l_t, s_t=s_t, rb=rb,
                          has_max=has_max),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=_vmem_params(
            interpret, 2 * rb * row_bytes, "segment_sum_max_pallas"
        ),
    )(*operands)
    if has_max:
        sums, maxs = res
        return sums[:, :, :out_cells], maxs[:, 0, :out_cells]
    return res[0][:, :, :out_cells]
