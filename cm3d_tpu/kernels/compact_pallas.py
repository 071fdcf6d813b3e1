"""Pallas TPU kernel: order-preserving row compaction as one-hot matmuls.

The lift step's dominant device cost is NOT its top_k sorts (~10 ms/batch)
but the gathers that follow them (~64 ms/batch measured: take_along_axis of
ids/words/coords through compacted positions — TPU gathers run ~12
cycles/element). This kernel replaces each top_k + gather pair entirely:

  out[r, :, l] = values[r, :, i_l]   where i_l = position of the l-th True
                                     of sel[r] (ascending; l >= count -> 0)

computed as dest = cumsum(sel) - 1 and a tiled one-hot contraction
`values_chunk [3D, S_T] @ (dest_chunk == l_range) [S_T, L_T]` on the MXU.
Exactness at full bf16 MXU rate: the one-hot factor is 0/1 (exact in
bf16) and each f32 value is pre-split into three bf16 components
(v = hi + lo + rest, 8+8+8 >= 24 mantissa bits, each split Sterbenz-exact),
so every output column reconstructs the original f32 bit-exactly from one
nonzero term per component. The D-major orientation keeps MXU utilization
high at small D (the [L, S] x [S, D] form wastes 128/D of the array).

Monotonicity of dest makes chunk-skipping trivial: an output tile
[l0, l0+L_T) only needs source chunks whose cumulative-count span
intersects it; per-(row, tile) chunk ranges are precomputed in XLA
(searchsorted on the chunk-boundary counts) and scalar-prefetched. Several
rows ride in each program to amortize per-program overhead.

Used by ops/lift.py to replace its compaction gathers; reference
semantics: src/nuscenes/2d_to_3d.py:597-647 (the per-mask point gathers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_L_T = 512   # output tile (lanes of the one-hot matmul)
_S_T = 1024  # source chunk (sublanes of the one-hot matmul)
# Defaults from the on-chip sweep (scripts/sweep_compact_tiles.py, r03 queue):
# 1024/512 wins at all three lift stages — camera 12.69 -> 10.47 ms,
# union 5.57 -> 5.35 ms, mask 12.14 -> 11.56 ms (batch-8 production shapes).
_RB = 8      # rows per program

# Mosaic's default vmem_limit_bytes is 16 MB regardless of hardware (v5e
# has 128 MB physical); large-D folded compactions can need one row block
# bigger than the default, so the kernels raise the cap and fail LOUDLY
# when even that can't fit (see _vmem_params).
VMEM_LIMIT = 100 * 1024 * 1024

# Measured TPU-worker fault frontier (r03 sessions 10-11 bisection,
# TPU_QUEUE_r03.log): the folded camera/union compactions at >= 96 rows
# over >= 32768 sources reproducibly KILLED the TPU worker ("kernel
# fault", a Mosaic/XLA codegen bug — the same shapes pass in interpret
# mode and on the XLA fallback path), while 48-row (batch-8) runs of the
# same kernels and 2048-row/8192-source mask compactions pass bit-exact.
# Mitigation (r04): calls whose row count exceeds the validated
# _SAFE_ROWS at a faulting source extent are AUTO-CHUNKED along the row
# grid into _SAFE_ROWS-row kernel launches — every launch then runs at a
# shape on-chip-validated bit-exact, removing the old batch-8 cap
# (previously a trace-time ValueError pointing at
# ops.lift._FOLD_CAMERA_UNION).
_FAULT_ROWS = 96    # bisected worker-kill frontier (rows)
_FAULT_SRC = 32768  # bisected worker-kill frontier (padded sources)
# Largest on-chip-validated row count at >= _FAULT_SRC sources. r05
# probes (scripts/probe_fold_envelope.py, TPU_QUEUE_r05.log): the FULL
# 8..80 grid at 8-row resolution passes BIT-EXACT at 32768 sources
# (balanced chunking emits arbitrary interior sizes, so the whole range
# is grid-validated, not just landmarks) where 96 kills the worker; the
# envelope rose 48 -> 80 and was re-validated through the real lift step
# by scripts/ab_fold_chunk.py (batch 16/32 bit-exact).
_SAFE_ROWS = 80


def _row_chunks(rows: int, s_padded: int, interpret: bool) -> int | None:
    """Rows-per-launch when the call must be chunked below the fault
    frontier; None = single launch is safe. Chunks are BALANCED (fewest
    launches, then equal sizes) so e.g. 192 rows run as 3x64 — one
    compiled shape — instead of 80+80+32."""
    if interpret:
        return None  # the interpreter executes the same shapes safely
    if rows > _SAFE_ROWS and s_padded >= _FAULT_SRC:
        n_launches = -(-rows // _SAFE_ROWS)
        return -(-rows // n_launches)
    return None


def _vmem_params(interpret: bool, prog_bytes: int, name: str):
    """Compiler params raising the VMEM cap; a clear error when one
    program's double-buffered blocks exceed even the raised cap (Mosaic's
    own failure is an opaque allocation error)."""
    if prog_bytes > VMEM_LIMIT:
        raise ValueError(
            f"{name}: one grid program needs ~{prog_bytes >> 20} MB VMEM "
            f"(> {VMEM_LIMIT >> 20} MB cap) — reduce the mask capacity, "
            "value dimension, or tile sizes"
        )
    if interpret:
        return None
    return pltpu.CompilerParams(
        dimension_semantics=("parallel",),
        vmem_limit_bytes=VMEM_LIMIT,
    )


def split3_bf16(vf):
    """Exact 3-way bf16 split of an f32 value block (8+8+8 >= 24 mantissa
    bits; each step Sterbenz-exact). MUST run INSIDE a Pallas kernel: in
    plain XLA the excess-precision pass folds f32->bf16->f32 round trips
    and silently zeroes the lo/rest components (measured on v5e)."""
    vh = vf.astype(jnp.bfloat16)
    r1 = vf - vh.astype(jnp.float32)
    vl = r1.astype(jnp.bfloat16)
    vm = (r1 - vl.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([vh, vl, vm], axis=0)


def broadcast_unbatched(x, batched, axis_size):
    """custom_vmap rule helper shared by every kernel in this package:
    broadcast an operand vmap saw as unbatched (no value dependency on the
    mapped axis — e.g. a broadcast_to validity mask or constant stream)
    so the rules can fold the batch into the row grid."""
    return x if batched else jnp.broadcast_to(x, (axis_size,) + x.shape)


def check_interpret_backend(interpret):
    """interpret=True under a TPU default backend runs the kernel body
    through XLA:TPU, where the in-kernel bf16 split gets folded away —
    results come back bf16-truncated with no error. Fail fast instead."""
    if interpret and jax.default_backend() != "cpu":
        raise RuntimeError(
            "Pallas interpret mode is only numerically exact on the cpu "
            f"backend (got {jax.default_backend()}): XLA:TPU folds the "
            "in-kernel bf16 value split"
        )


def _compact_kernel(lo_ref, hi_ref, dest_ref, vals_ref, out_ref,
                    *, d, l_t, s_t, rb):
    """One program = `rb` rows.

    lo_ref/hi_ref: scalar-prefetch [R * n_ltiles] int32 — source-chunk
    range per output tile (flattened 1-D: 2-D scalar arrays pad to 128
    lanes in SMEM and blow its 1 MB budget).
    dest_ref: [rb, 1, S] int32 (-1 at unselected positions).
    vals_ref: [rb, D, S] f32. out_ref: [rb, D, L] f32.

    The 3-way bf16 split happens IN-KERNEL: outside, XLA's excess-precision
    folding eliminates f32->bf16->f32 round trips, silently zeroing the
    lo/rest components (observed on v5e); Mosaic compiles the converts
    literally.
    """
    r0 = pl.program_id(0) * rb
    n_ltiles = out_ref.shape[2] // l_t
    for j in range(rb):  # static unroll over the program's rows
        for lt in range(n_ltiles):
            l0 = lt * l_t
            lr = l0 + jax.lax.broadcasted_iota(jnp.int32, (1, l_t), 1)

            def body(ci, acc, j=j, lr=lr):
                dchunk = dest_ref[j, 0, pl.ds(ci * s_t, s_t)].reshape(s_t, 1)
                oh = (dchunk == lr).astype(jnp.bfloat16)  # [s_t, l_t]
                vf = vals_ref[j, :, pl.ds(ci * s_t, s_t)]  # [d, s_t] f32
                v3 = split3_bf16(vf)  # [3d, s_t]
                return acc + jax.lax.dot_general(
                    v3, oh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            acc = jax.lax.fori_loop(
                lo_ref[(r0 + j) * n_ltiles + lt],
                hi_ref[(r0 + j) * n_ltiles + lt],
                body, jnp.zeros((3 * d, l_t), jnp.float32),
            )
            out_ref[j, :, pl.ds(l0, l_t)] = (
                acc[:d] + acc[d : 2 * d] + acc[2 * d :]
            )


@functools.lru_cache(maxsize=None)
def _compact_vmappable(limit: int, interpret: bool, s_tile: int, l_tile: int):
    """Rows ARE the batch axis here, so vmap must merge the mapped axis
    into R instead of scanning (default pallas batching lowered the call
    to an XLA while over the batch — measured ~2x the kernel's own time)."""

    @jax.custom_batching.custom_vmap
    def f(sel, values):
        return _compact_rows_impl(sel, values, limit, interpret,
                                  s_tile, l_tile)

    @f.def_vmap
    def _rule(axis_size, in_batched, sel, values):
        sel = broadcast_unbatched(sel, in_batched[0], axis_size)
        values = broadcast_unbatched(values, in_batched[1], axis_size)
        b, r, s = sel.shape
        d = values.shape[2]
        out = f(sel.reshape(b * r, s), values.reshape(b * r, d, s))
        return out.reshape(b, r, d, out.shape[-1]), True

    return f


def compact_rows_pallas(
    sel: jax.Array,      # [R, S] bool
    values: jax.Array,   # [R, D, S] f32
    limit: int,
    interpret: bool = False,
    s_tile: int | None = None,
    l_tile: int | None = None,
) -> jax.Array:
    """Returns out [R, D, limit] f32 with out[r, :, l] = values[r, :, i_l].

    i_l = ascending position of the l-th selected entry of sel[r]; columns
    at l >= count(r) are exactly 0. BIT-EXACT equivalent of (and
    replacement for)
    `ids, ok = _compact_topk(sel, limit); take_along_axis(values, ids)`.
    Under vmap the batch folds into R (one kernel launch, no scan).

    s_tile/l_tile override the source-chunk / output-tile sizes (the MXU
    work scales ~ covered_S * (l_tile + sel_frac * s_tile), so dense
    selections want smaller tiles; None = module defaults).
    """
    check_interpret_backend(interpret)
    return _compact_vmappable(
        int(limit), bool(interpret),
        int(s_tile or _S_T), int(l_tile or _L_T),
    )(sel, values)


def _compact_rows_impl(sel, values, limit, interpret, s_tile=_S_T,
                       l_tile=_L_T):
    r, s = sel.shape
    d = values.shape[1]
    assert values.shape == (r, d, s), (values.shape, (r, d, s))
    # Pad S / limit up to tile multiples (padding is unselected / sliced
    # off), so arbitrary geometries work — the lift derives NU/K from the
    # point-cloud size, which need not hit the production multiples.
    s_t = min(s_tile, s)
    # the kernel's dynamic lane-dim slice offsets (ci * s_t) are only
    # Mosaic-legal when 128-aligned; round the chunk up — the padding
    # below absorbs the difference (static offsets like l0 may stay odd)
    s_t = -(-s_t // 128) * 128
    # vmapped calls fold the batch into r first (custom_vmap rule), so
    # this sees the true on-chip row count; the frontier is checked on
    # the PADDED source count — the kernel runs at the padded shape, and
    # a pre-padding check would let e.g. s=32000 pad up to the measured
    # 32768-source worker-kill frontier undetected
    s_padded = -(-s // s_t) * s_t
    chunk = _row_chunks(r, s_padded, interpret)
    if chunk is not None:
        # auto-chunk the row grid below the Mosaic fault frontier: each
        # launch re-runs this impl at <= _SAFE_ROWS rows (bit-exact — the
        # kernel is row-independent), restoring batch 16/32 lift folds
        outs = [
            _compact_rows_impl(sel[r0:r0 + chunk], values[r0:r0 + chunk],
                               limit, interpret, s_tile, l_tile)
            for r0 in range(0, r, chunk)
        ]
        return jnp.concatenate(outs, axis=0)
    if s_padded != s:
        pad = s_padded - s
        sel = jnp.pad(sel, ((0, 0), (0, pad)))
        values = jnp.pad(values, ((0, 0), (0, 0), (0, pad)))
        s = s_padded
    out_limit = limit
    l_t = min(l_tile, limit)
    if limit % l_t:
        limit += l_t - limit % l_t
    # rows per program, shrunk so the double-buffered per-program blocks
    # (vals [rb, D, S] f32 + dest [rb, 1, S] i32 + out) stay ~<=4 MB —
    # at S=131072 even rb=2 would overrun the 16 MB VMEM budget
    row_bytes = (d + 1) * s * 4 + d * limit * 4
    rb = max(1, min(_RB, (4 << 20) // max(row_bytes, 1)))
    while rb > 1 and r % rb:
        rb -= 1
    n_chunks = s // s_t
    n_ltiles = limit // l_t

    c = jnp.cumsum(sel.astype(jnp.int32), axis=1)  # [R, S] inclusive
    dest = jnp.where(sel, c - 1, -1)

    # chunk-boundary counts: bounds[r, i] = #selected before chunk i
    bounds = jnp.concatenate(
        [jnp.zeros((r, 1), jnp.int32), c[:, s_t - 1 :: s_t]], axis=1
    )  # [R, n_chunks + 1]
    l0s = jnp.arange(n_ltiles, dtype=jnp.int32) * l_t  # [n_ltiles]
    # lo = first chunk with bounds[i+1] > l0 ; hi = first with bounds[i] >= l0+l_t
    lo = jnp.sum(
        bounds[:, None, 1:] <= l0s[None, :, None], axis=2
    ).astype(jnp.int32)  # [R, n_ltiles]
    hi = jnp.sum(
        bounds[:, None, :-1] < (l0s + l_t)[None, :, None], axis=2
    ).astype(jnp.int32)
    hi = jnp.minimum(hi, n_chunks)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # lo, hi
        grid=(r // rb,),
        in_specs=[
            pl.BlockSpec((rb, 1, s), lambda i, lo, hi: (i, 0, 0)),
            pl.BlockSpec((rb, d, s), lambda i, lo, hi: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((rb, d, limit), lambda i, lo, hi: (i, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_compact_kernel, d=d, l_t=l_t, s_t=s_t, rb=rb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, d, limit), jnp.float32),
        interpret=interpret,
        compiler_params=_vmem_params(
            interpret, 2 * rb * row_bytes, "compact_rows_pallas"
        ),
    )(lo.reshape(-1), hi.reshape(-1), dest[:, None, :],
      values.astype(jnp.float32))
    return out[:, :, :out_limit]
