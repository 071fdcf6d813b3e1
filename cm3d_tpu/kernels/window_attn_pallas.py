"""Fused window-attention block kernel (Swin + SAM windowed blocks).

One pallas_call absorbs LayerNorm -> qkv Dense -> per-head windowed
attention (+rel-pos bias, +shift mask) -> output projection for a tile of
G adjacent windows, reading the feature map ONCE in its native
[B, Hp, Wp, C] layout and writing the projected output back in the same
layout. This eliminates the window-partition 6-D transposes and the qkv
[B*nW, n, 3, heads, hd] layout copies that XLA materializes around the
reference-shaped path (profiled at ~23 ms of Detic's 114 ms batch-6 —
CLAUDE.md "Remaining candidates"; reference hot loop:
/root/reference/src/nuscenes/gen_2d_masks_detic.py:303).

Core trick — interleaved block-diagonal attention: a grid step loads one
window-row tile [win, G*win, C] whose natural token order is
i = r*(G*win) + w*win + c (row-major across the G windows). Per-window
attention over that order is a block-structured [T, T] problem (T = G*n,
n = win^2): computing the FULL dense QK^T and masking cross-window pairs
to -1e9 wastes a factor G of MXU flops but keeps every matmul large,
aligned and transpose-free — on TPU that beats G separate [n, n]
matmuls with their layout shuffles. The rel-pos bias (+ optional shifted
-window mask) is pre-expanded into the same interleaved order by
`expand_bias_interleaved` / `expand_blockdiag` (plain jnp, outside the
kernel, so big shift masks are computed per forward instead of baked as
multi-MB constants).

Numerics: LN and softmax reductions in f32; matmuls in the model compute
dtype (bf16 on TPU) with f32 accumulation — identical reduction layout to
the unfused path, so outputs match to bf16 rounding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# ONE VMEM cap for all kernels in this package (compact_pallas owns it):
# Mosaic's default vmem_limit_bytes is 16 MB regardless of hardware; the
# target chip (v5e) has 128 MB of physical VMEM. Raising the cap lets the
# SAM-scale kernels (C=1280: 13.1 MB of weights alone) tile multiple
# windows per grid step, which is where the MXU utilization comes from.
from cm3d_tpu.kernels.compact_pallas import (
    VMEM_LIMIT,
    check_interpret_backend,
)

NEG = -1e9


def _check_heads_vmem(name: str, C: int, heads: int, win: int, G: int,
                      dtype, has_btil: bool) -> None:
    """Loud trace-time checks shared by both public entry points.

    C % heads: the unrolled head loop writes out_s[:, :heads*hd] only —
    a non-divisible head count would leave the tail columns of the
    scratch UNINITIALIZED and the projection would fold VMEM garbage
    into every output channel (silently on hardware; interpret mode
    zero-fills so tests can't catch it).

    VMEM: a conservative per-program estimate (weights + bias tile +
    f32 scratch) so a too-big tiling fails with actionable advice
    instead of Mosaic's opaque allocation error (same contract as
    compact_pallas._vmem_params)."""
    if C % heads:
        raise ValueError(
            f"{name}: channels {C} not divisible by heads {heads} — the "
            "head loop would leave uninitialized scratch columns"
        )
    T = win * win * G
    dsize = jnp.dtype(dtype).itemsize
    prog_bytes = 4 * C * C * dsize + 6 * T * C * 4
    if has_btil:
        prog_bytes += heads * T * T * 4
    if prog_bytes > VMEM_LIMIT:
        raise ValueError(
            f"{name}: one grid program needs ~{prog_bytes >> 20} MB VMEM "
            f"(> {VMEM_LIMIT >> 20} MB cap) — reduce the window group G "
            "(pick_group), the window size, or the channel width"
        )


def _compiler_params(interpret: bool):
    if interpret:
        return None
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        vmem_limit_bytes=VMEM_LIMIT,
    )


def expand_blockdiag(blocks: jax.Array, win: int) -> jax.Array:
    """[..., G, n, n] per-window matrices -> [..., T, T] interleaved
    block-diagonal (zeros off the diagonal), T = G*n, token order
    i = r*(G*win) + w*win + c."""
    *lead, g, n, _ = blocks.shape
    b5 = blocks.reshape(*lead, g, win, win, win, win)  # w, ri, ci, rj, cj
    eye = jnp.eye(g, dtype=blocks.dtype)
    out = jnp.einsum("...wpqrs,wv->...pwqrvs", b5, eye)
    t = g * n
    return out.reshape(*lead, t, t)


@functools.lru_cache(maxsize=None)
def _offdiag_np(win: int, g: int) -> np.ndarray:
    """[T, T] f32: 0 on same-window pairs, NEG elsewhere."""
    t_w = np.tile(np.repeat(np.arange(g), win), win)  # window id per token
    return np.where(t_w[:, None] == t_w[None, :], 0.0, NEG).astype(np.float32)


def expand_bias_interleaved(bias_hnn: jax.Array, win: int, g: int) -> jax.Array:
    """[heads, n, n] shared rel-pos bias -> [heads, T, T] interleaved with
    cross-window pairs at -1e9 (the kernel's only masking mechanism)."""
    heads, n, _ = bias_hnn.shape
    tiled = jnp.broadcast_to(bias_hnn[:, None], (heads, g, n, n))
    return expand_blockdiag(tiled, win) + jnp.asarray(_offdiag_np(win, g))


def _ln_qkv_prologue(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, qkv_s,
                     *, win, GW, T, C, dtype, eps, bounds):
    """LayerNorm + bounds re-zeroing + qkv projection into scratch, shared
    by both kernel variants (the pre-roll bounds reconstruction is the
    subtlest logic in the file and must exist exactly once)."""
    xf = x_ref[0, 0, :, 0].reshape(T, C).astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    ln = xc * jax.lax.rsqrt(var + eps) * g_ref[:] + b_ref[:]
    if bounds is not None:
        # Reference semantics pad AFTER LayerNorm with exact zeros (the
        # zero tokens attend within edge windows); re-zero them here.
        # bounds = (h_real, w_real, wp_ref, shift) in PRE-ROLL coords.
        h_real, w_real, wp_ref, shift = bounds
        hp = win * pl.num_programs(1)
        idx = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
        grow = pl.program_id(1) * win + idx // GW
        gcol = pl.program_id(2) * GW + idx % GW
        valid = ((grow + shift) % hp) < h_real
        valid &= gcol < wp_ref
        valid &= ((gcol + shift) % wp_ref) < w_real
        ln = jnp.where(valid, ln, 0.0)
    qkv_s[:] = (
        jnp.dot(ln.astype(dtype), wqkv_ref[:],
                preferred_element_type=jnp.float32)
        + bqkv_ref[:]
    ).astype(dtype)


def _proj_epilogue(out_s, wproj_ref, bproj_ref, out_ref, *, win, GW, C):
    proj = jnp.dot(
        out_s[:], wproj_ref[:], preferred_element_type=jnp.float32
    ) + bproj_ref[:]
    out_ref[0, 0, :, 0] = proj.reshape(win, GW, C).astype(out_ref.dtype)


def _wattn_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wproj_ref,
                  bproj_ref, btil_ref, *rest, win, G, heads, C, dtype,
                  eps, has_mask, bounds):
    if has_mask:
        mtil_ref, out_ref, qkv_s, out_s = rest
    else:
        (out_ref, qkv_s, out_s) = rest
        mtil_ref = None
    GW = G * win
    T = win * GW
    hd = C // heads

    _ln_qkv_prologue(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, qkv_s,
                     win=win, GW=GW, T=T, C=C, dtype=dtype, eps=eps,
                     bounds=bounds)

    scale = hd ** -0.5

    # Unrolled head loop: Mosaic requires DYNAMIC lane-dim slice offsets
    # to be 128-multiples, but static offsets at hd granularity are fine.
    for h in range(heads):
        q = qkv_s[:, h * hd:(h + 1) * hd]
        k = qkv_s[:, C + h * hd:C + (h + 1) * hd]
        v = qkv_s[:, 2 * C + h * hd:2 * C + (h + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = s + btil_ref[h]
        if mtil_ref is not None:
            s = s + mtil_ref[0, 0]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        out_s[:, h * hd:(h + 1) * hd] = jnp.dot(
            p.astype(dtype), v, preferred_element_type=jnp.float32
        ).astype(dtype)

    _proj_epilogue(out_s, wproj_ref, bproj_ref, out_ref,
                   win=win, GW=GW, C=C)


def _impl(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, btil, mtil,
          win, G, heads, dtype, eps, interpret, bounds):
    b, hp, wp, c = x.shape
    gw = G * win
    assert hp % win == 0 and wp % gw == 0, (hp, wp, win, G)
    n_wy, n_gx = hp // win, wp // gw
    t = win * gw
    dtype = jnp.dtype(dtype)

    # Split H -> (nWy, win) and W -> (nGx, GW) as free views so every
    # blocked axis is EQUAL to its full array dim (Mosaic requires the
    # last two block dims divisible by (8, 128) or full-size; GW=70 etc.
    # satisfy neither until they're their own axes).
    x6 = x.reshape(b, n_wy, win, n_gx, gw, c)
    in_specs = [
        pl.BlockSpec(
            (1, 1, win, 1, gw, c), lambda bi, i, j: (bi, i, 0, j, 0, 0)
        ),
        pl.BlockSpec((c,), lambda bi, i, j: (0,)),
        pl.BlockSpec((c,), lambda bi, i, j: (0,)),
        pl.BlockSpec((c, 3 * c), lambda bi, i, j: (0, 0)),
        pl.BlockSpec((3 * c,), lambda bi, i, j: (0,)),
        pl.BlockSpec((c, c), lambda bi, i, j: (0, 0)),
        pl.BlockSpec((c,), lambda bi, i, j: (0,)),
        pl.BlockSpec((heads, t, t), lambda bi, i, j: (0, 0, 0)),
    ]
    args = [
        x6,
        ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32),
        wqkv.astype(dtype), bqkv.astype(jnp.float32),
        wproj.astype(dtype), bproj.astype(jnp.float32),
        btil.astype(jnp.float32),
    ]
    if mtil is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, t, t), lambda bi, i, j: (i, j, 0, 0))
        )
        args.append(mtil.astype(jnp.float32))

    from jax.experimental.pallas import tpu as pltpu

    out = pl.pallas_call(
        functools.partial(
            _wattn_kernel, win=win, G=G, heads=heads, C=c, dtype=dtype,
            eps=eps, has_mask=mtil is not None, bounds=bounds,
        ),
        grid=(b, n_wy, n_gx),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, win, 1, gw, c), lambda bi, i, j: (bi, i, 0, j, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_wy, win, n_gx, gw, c), dtype),
        scratch_shapes=[
            pltpu.VMEM((t, 3 * c), dtype),
            pltpu.VMEM((t, c), dtype),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(*args)
    return out.reshape(b, hp, wp, c)


@functools.lru_cache(maxsize=None)
def _vmappable(win, G, heads, dtype, eps, has_mask, interpret, bounds):
    def call(x, params, mtil):
        return _impl(
            x, *params, mtil, win, G, heads, dtype, eps, interpret, bounds
        )

    def fold(f, x, params, *mt):
        # vmap folds the new batch dim into the kernel's grid B axis —
        # the default pallas batching rule lowers vmap to an XLA
        # while-scan over the batch (~2x kernel time, see
        # kernels/compact_pallas.py). Recursing through f keeps further
        # vmap levels on the same fast path.
        b2, b = x.shape[:2]
        out = f(x.reshape(b2 * b, *x.shape[2:]), params, *mt)
        return out.reshape(b2, b, *out.shape[1:]), True

    if has_mask:
        @jax.custom_batching.custom_vmap
        def f(x, params, mtil):
            return call(x, params, mtil)

        @f.def_vmap
        def _rule(axis_size, in_batched, x, params, mtil):
            assert in_batched[0] and not any(jax.tree.leaves(in_batched[1:]))
            return fold(f, x, params, mtil)
    else:
        @jax.custom_batching.custom_vmap
        def f(x, params):
            return call(x, params, None)

        @f.def_vmap
        def _rule(axis_size, in_batched, x, params):
            assert in_batched[0] and not any(jax.tree.leaves(in_batched[1:]))
            return fold(f, x, params)

    return f


def fused_window_attn(
    x: jax.Array,        # [B, Hp, Wp, C] (extra vmap dims fold into B)
    ln_scale: jax.Array,  # [C]
    ln_bias: jax.Array,   # [C]
    wqkv: jax.Array,      # [C, 3C]
    bqkv: jax.Array,      # [3C]
    wproj: jax.Array,     # [C, C]
    bproj: jax.Array,     # [C]
    btil: jax.Array,      # [heads, T, T] from expand_bias_interleaved
    mtil: jax.Array | None,  # [nWy, nGx, T, T] shifted-window mask or None
    *,
    win: int,
    G: int,
    heads: int,
    dtype="bfloat16",
    eps: float = 1e-6,
    interpret: bool = False,
    bounds: tuple | None = None,  # (h_real, w_real, wp_ref, shift)
) -> jax.Array:
    """LayerNorm + qkv + windowed attention + proj, fused. Returns the
    projected attention output in [B, Hp, Wp, C] (caller adds the
    residual).

    Hp must be a multiple of win and Wp of G*win (pad first; padded zero
    tokens attend only within their own window and are cropped by the
    caller). See module docstring for layout/masking semantics.
    """
    check_interpret_backend(interpret)
    _check_heads_vmem("fused_window_attn", int(x.shape[-1]), int(heads),
                      int(win), int(G), dtype, has_btil=True)
    f = _vmappable(
        int(win), int(G), int(heads), jnp.dtype(dtype).name, float(eps),
        mtil is not None, bool(interpret),
        None if bounds is None else tuple(int(v) for v in bounds),
    )
    params = (ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, btil)
    if mtil is not None:
        return f(x, params, mtil)
    return f(x, params)


def pick_group(n_wx: int, n_tokens: int, max_t: int = 512) -> int:
    """Windows per kernel tile: as many as fit max_t tokens (flop waste is
    linear in G but alignment wins dominate for small windows)."""
    return max(1, min(n_wx, max_t // n_tokens))


# ---------------------------------------------------------------------------
# SAM variant: decomposed relative-position bias computed IN-KERNEL.
#
# SAM's windowed ViT blocks add a q-DEPENDENT bias
# (models/common.py add_decomposed_rel_pos): bias_h[(r,c),(kx,kc)] =
# q[(r,c)] . table_h[r - kx + win - 1] (+ the analogous width term), so
# it cannot be precomputed like Swin's table bias. The Toeplitz structure
# makes it one small matmul + static diagonal slices per head:
#   P = q @ table_rev.T                       # [T, 2win-1]
#   bias_h[r-block, :, kx] = P[..., (win-1-r) + kx]  # forward slice per r
# (table_rev is the 1-D rel table reversed, so each row's window of
# relative offsets is a CONTIGUOUS forward slice).
# ---------------------------------------------------------------------------


def _wattn_relpos_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref,
                         wproj_ref, bproj_ref, relh_ref, relw_ref,
                         out_ref, qkv_s, out_s, *, win, G, heads, C,
                         dtype, eps, bounds):
    GW = G * win
    T = win * GW
    hd = C // heads
    two = 2 * win - 1

    _ln_qkv_prologue(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, qkv_s,
                     win=win, GW=GW, T=T, C=C, dtype=dtype, eps=eps,
                     bounds=bounds)

    scale = hd ** -0.5
    if G > 1:
        tok_w = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0) % GW // win
        key_w = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1) % GW // win
        offdiag = jnp.where(tok_w == key_w, 0.0, NEG).astype(jnp.float32)

    # Lane-reshape-free bias machinery (Mosaic rejects lane-splitting
    # shape casts like [T,T] -> [T,win,G,win]):
    #   bh[t, kx] = ph[t, (win-1) - r(t) + kx] via row-class select-sums,
    #   broadcast over keys as bh @ Eh with one-hot Eh[kx, j]=(j//GW==kx).
    ti = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    row_r = ti // GW
    row_c = ti % win
    jx = jax.lax.broadcasted_iota(jnp.int32, (win, T), 1)
    kxi = jax.lax.broadcasted_iota(jnp.int32, (win, T), 0)
    eh = (jx // GW % win == kxi).astype(dtype)  # [win(kx), T]
    ew = (jx % win == kxi).astype(dtype)  # [win(kc), T]

    for h in range(heads):
        q = qkv_s[:, h * hd:(h + 1) * hd]
        k = qkv_s[:, C + h * hd:C + (h + 1) * hd]
        v = qkv_s[:, 2 * C + h * hd:2 * C + (h + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        # decomposed rel-pos bias (raw q, reference semantics)
        ph = jax.lax.dot_general(
            q, relh_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, 2win-1]
        pw = jax.lax.dot_general(
            q, relw_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        bh = jnp.zeros((T, win), jnp.float32)
        bw = jnp.zeros((T, win), jnp.float32)
        for u in range(win):
            bh = bh + jnp.where(
                row_r == u, ph[:, win - 1 - u: two - u], 0.0
            )
            bw = bw + jnp.where(
                row_c == u, pw[:, win - 1 - u: two - u], 0.0
            )
        # expansion dots in the COMPUTE dtype: the one-hot side is exact
        # in bf16 and the unfused path's bias einsums run in bf16 too
        # (f32 HIGHEST here costs 6x MXU passes — measured ~40 ms/encode)
        s = s + jax.lax.dot_general(
            bh.astype(dtype), eh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            bw.astype(dtype), ew, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if G > 1:
            s = s + offdiag
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        out_s[:, h * hd:(h + 1) * hd] = jnp.dot(
            p.astype(dtype), v, preferred_element_type=jnp.float32
        ).astype(dtype)

    _proj_epilogue(out_s, wproj_ref, bproj_ref, out_ref,
                   win=win, GW=GW, C=C)


def _impl_relpos(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                 relh_rev, relw_rev, win, G, heads, dtype, eps, interpret,
                 bounds):
    b, hp, wp, c = x.shape
    gw = G * win
    assert hp % win == 0 and wp % gw == 0, (hp, wp, win, G)
    n_wy, n_gx = hp // win, wp // gw
    dtype = jnp.dtype(dtype)
    two = 2 * win - 1

    x6 = x.reshape(b, n_wy, win, n_gx, gw, c)
    in_specs = [
        pl.BlockSpec(
            (1, 1, win, 1, gw, c), lambda bi, i, j: (bi, i, 0, j, 0, 0)
        ),
        pl.BlockSpec((c,), lambda bi, i, j: (0,)),
        pl.BlockSpec((c,), lambda bi, i, j: (0,)),
        pl.BlockSpec((c, 3 * c), lambda bi, i, j: (0, 0)),
        pl.BlockSpec((3 * c,), lambda bi, i, j: (0,)),
        pl.BlockSpec((c, c), lambda bi, i, j: (0, 0)),
        pl.BlockSpec((c,), lambda bi, i, j: (0,)),
        pl.BlockSpec((two, c // heads), lambda bi, i, j: (0, 0)),
        pl.BlockSpec((two, c // heads), lambda bi, i, j: (0, 0)),
    ]
    from jax.experimental.pallas import tpu as pltpu

    t = win * gw
    out = pl.pallas_call(
        functools.partial(
            _wattn_relpos_kernel, win=win, G=G, heads=heads, C=c,
            dtype=dtype, eps=eps, bounds=bounds,
        ),
        grid=(b, n_wy, n_gx),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, win, 1, gw, c), lambda bi, i, j: (bi, i, 0, j, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_wy, win, n_gx, gw, c), dtype),
        scratch_shapes=[
            pltpu.VMEM((t, 3 * c), dtype),
            pltpu.VMEM((t, c), dtype),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(
        x6,
        ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32),
        wqkv.astype(dtype), bqkv.astype(jnp.float32),
        wproj.astype(dtype), bproj.astype(jnp.float32),
        relh_rev.astype(dtype), relw_rev.astype(dtype),
    )
    return out.reshape(b, hp, wp, c)


@functools.lru_cache(maxsize=None)
def _vmappable_relpos(win, G, heads, dtype, eps, interpret, bounds):
    def call(x, params):
        return _impl_relpos(
            x, *params, win, G, heads, dtype, eps, interpret, bounds
        )

    @jax.custom_batching.custom_vmap
    def f(x, params):
        return call(x, params)

    @f.def_vmap
    def _rule(axis_size, in_batched, x, params):
        assert in_batched[0] and not any(jax.tree.leaves(in_batched[1:]))
        b2, b = x.shape[:2]
        out = f(x.reshape(b2 * b, *x.shape[2:]), params)
        return out.reshape(b2, b, *out.shape[1:]), True

    return f


def fused_window_attn_relpos(
    x: jax.Array,         # [B, Hp, Wp, C] (extra vmap dims fold into B)
    ln_scale: jax.Array,  # [C]
    ln_bias: jax.Array,   # [C]
    wqkv: jax.Array,      # [C, 3C]
    bqkv: jax.Array,      # [3C]
    wproj: jax.Array,     # [C, C]
    bproj: jax.Array,     # [C]
    rel_pos_h: jax.Array,  # [2*win-1, head_dim] (raw table, un-reversed)
    rel_pos_w: jax.Array,  # [2*win-1, head_dim]
    *,
    win: int,
    G: int,
    heads: int,
    dtype="bfloat16",
    eps: float = 1e-6,
    interpret: bool = False,
    bounds: tuple | None = None,  # (h_real, w_real, wp_ref, 0)
) -> jax.Array:
    """SAM windowed-block attention fused (LN + qkv + decomposed-rel-pos
    attention + proj). Same contract as fused_window_attn, with the
    q-dependent decomposed bias computed in-kernel (Toeplitz slices)."""
    check_interpret_backend(interpret)
    _check_heads_vmem("fused_window_attn_relpos", int(x.shape[-1]),
                      int(heads), int(win), int(G), dtype, has_btil=False)
    f = _vmappable_relpos(
        int(win), int(G), int(heads), jnp.dtype(dtype).name, float(eps),
        bool(interpret),
        None if bounds is None else tuple(int(v) for v in bounds),
    )
    params = (ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
              rel_pos_h[::-1], rel_pos_w[::-1])
    return f(x, params)
