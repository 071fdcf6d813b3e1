"""Flash attention with SAM's decomposed relative-position bias (Pallas).

SAM ViT-H's four global-attention blocks at 4096 tokens are the encoder's
hot spot: the XLA path materializes the [heads, 4096, 4096] logits plus the
rel-pos broadcast tensors in HBM (~10 ms/block even after layout fixes).
This kernel streams one query block at a time through VMEM — logits, bias
add, softmax and the value matmul never touch HBM. The decomposed bias
(bias[q, k] = rel_h[q, row(k)] + rel_w[q, col(k)], Kirillov et al. 2023 /
ViTDet) is applied inside the kernel from its two compact [N, KH]/[N, KW]
factors, so nothing quadratic is ever materialized.

Numerics: logits accumulate in f32 on the MXU from bf16 q/k (the XLA path
computed them in bf16 — the kernel is strictly more precise), softmax in
f32, probabilities cast to the value dtype for the second matmul (same as
the XLA path).

Reference behavior replaced: the attention inside ViTAttention for global
blocks (models/sam.py), i.e. torch SAM's `image_encoder` attention
(SamPredictor checkpoints; see models/convert_sam.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _expansion_mats(n, kh, kw, dtype):
    """0/1 expansion matrices shared by both entry points: eh[r, k] =
    [row(k) == r], ew[c, k] = [col(k) == c]. They follow the compute
    dtype: bf16 runs the MXU at full rate (f32 is 1/8) and the 0/1
    expansion itself is exact in any dtype — this argument is load-bearing
    for both kernels, so it lives once."""
    bdt = dtype if dtype == jnp.bfloat16 else jnp.float32
    karange = jnp.arange(n)
    eh = (karange[None, :] // kw == jnp.arange(kh)[:, None]).astype(bdt)
    ew = (karange[None, :] % kw == jnp.arange(kw)[:, None]).astype(bdt)
    return eh, ew


def _kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, eh_ref, ew_ref, o_ref):
    q = q_ref[0]  # [Bq, dp] (pre-scaled)
    k = k_ref[0]  # [N, dp]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Bq, N] f32
    # bias[q, k] = rh[q, row(k)] + rw[q, col(k)], expanded to [Bq, N] with
    # 0/1 matrices on the MXU (Mosaic cannot merge a [Bq, KH, KW] minor
    # pair back into lanes). bf16 inputs are EXACT here: every output
    # element is one rh/rw value times 1.0 — and bf16 matmuls run the MXU
    # at full rate (f32 is 1/8).
    s = s + jax.lax.dot_general(
        rh_ref[0], eh_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + jax.lax.dot_general(
        rw_ref[0], ew_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Bq, dp]
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _kernel_qkv(q_ref, k_ref, v_ref, bh_ref, bw_ref, eh_ref, ew_ref, o_ref,
                acc_ref, m_ref, l_ref, *, scale, n_kb):
    """Online-softmax flash step: one (q block, k chunk) tile, ALL heads.

    q_ref [1, bq, 1, heads, d]; k/v_ref [1, bk, 1, heads, d] (views of the
    natural qkv tensor); bh_ref [1, heads, bq, KH]; bw_ref [1, heads, bq,
    KW]; eh_ref [KH, bk]; ew_ref [KW, bk]; o_ref [1, bq, heads, d].
    Scratch: acc [heads, bq, d] f32, m/l [heads, bq] f32 (persist across the
    innermost k-chunk grid axis). In-kernel VMEM transposes put heads at
    position 0 because Mosaic's batched dot requires batch dims there.
    """
    kj = pl.program_id(2)

    @pl.when(kj == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)

    sc = jnp.asarray(scale, q_ref.dtype)  # bf16 == the XLA path's rounding
    q = jnp.transpose(q_ref[0, :, 0], (1, 0, 2))  # [heads, bq, d] UNSCALED
    k = jnp.transpose(k_ref[0, :, 0], (1, 0, 2))  # [heads, bk, d]
    v = jnp.transpose(v_ref[0, :, 0], (1, 0, 2))
    s = jax.lax.dot_general(
        q * sc, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [heads, bq, bk] f32
    s = s + jax.lax.dot_general(
        bh_ref[0], eh_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + jax.lax.dot_general(
        bw_ref[0], ew_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_prev = m_ref[...]  # [heads, bq]
    l_prev = l_ref[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new[..., None])  # [heads, bq, bk] f32
    l_ref[...] = l_prev * alpha + jnp.sum(p, axis=-1)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [heads, bq, d]
    acc_ref[...] = acc_ref[...] * alpha[..., None] + pv
    m_ref[...] = m_new

    @pl.when(kj == n_kb - 1)
    def _emit():
        out = acc_ref[...] / l_ref[...][..., None]  # [heads, bq, d]
        o_ref[0] = jnp.transpose(out, (1, 0, 2)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention_qkv(
    qkv: jax.Array,     # [B, N, 3, heads, d] — the qkv Dense output reshaped
    bias_h: jax.Array,  # [B, heads, N, KH] (unscaled q . rel_h table)
    bias_w: jax.Array,  # [B, heads, N, KW]; KH * KW == N
    interpret: bool = False,
) -> jax.Array:
    """Flash attention straight off the natural qkv layout.

    Returns [B, N, heads, d] (reshape to [B, H, W, heads*d] is layout-free).

    Why a second entry point: flash_attention_relpos takes [H, N, d]
    operands, which forces transposes + pads around the custom call AND
    flips XLA's layout assignment for the whole residual stream to
    degenerate T(1,128)/T(2,128) tilings (measured +18 ms across the other
    31 blocks of a SAM ViT-H encode). Here every operand is a BlockSpec
    view of the tensors the surrounding graph already produces — no layout
    pressure at the custom-call boundary. The q/k/v planes are three
    different views of the SAME qkv array; k/v stream in chunks with an
    online softmax (all heads ride in each block, since Mosaic requires
    the last two block dims to match the array dims here).
    """
    b, n, three, h, d = qkv.shape
    assert three == 3
    kh, kw = bias_h.shape[-1], bias_w.shape[-1]
    assert kh * kw == n, (kh, kw, n)
    scale = float(d) ** -0.5

    # tile sizes sized for the default 16 MB scoped-vmem budget: the f32
    # [heads, bq, bk] logits tile is the dominant term
    bq = next((c for c in (128,) if n % c == 0 and n > c), n)
    bk = next((c for c in (256, 128) if n % c == 0 and n > c), n)

    eh, ew = _expansion_mats(n, kh, kw, qkv.dtype)

    n_kb = n // bk
    out = pl.pallas_call(
        functools.partial(_kernel_qkv, scale=scale, n_kb=n_kb),
        out_shape=jax.ShapeDtypeStruct((b, n, h, d), qkv.dtype),
        grid=(b, n // bq, n_kb),  # kj innermost: accumulators per q block
        in_specs=[
            pl.BlockSpec((1, bq, 1, h, d), lambda bi, qi, kj: (bi, qi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, 1, h, d), lambda bi, qi, kj: (bi, kj, 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, 1, h, d), lambda bi, qi, kj: (bi, kj, 2, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, bq, kh), lambda bi, qi, kj: (bi, 0, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, bq, kw), lambda bi, qi, kj: (bi, 0, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, bk), lambda bi, qi, kj: (0, kj),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kw, bk), lambda bi, qi, kj: (0, kj),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, h, d), lambda bi, qi, kj: (bi, qi, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h, bq, d), jnp.float32),
            pltpu.VMEM((h, bq), jnp.float32),
            pltpu.VMEM((h, bq), jnp.float32),
        ],
        interpret=interpret,
    )(qkv, qkv, qkv, bias_h.astype(eh.dtype), bias_w.astype(eh.dtype), eh, ew)
    return out


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention_relpos(
    q: jax.Array,  # [H, N, d] — already scaled by head_dim**-0.5
    k: jax.Array,  # [H, N, d]
    v: jax.Array,  # [H, N, d]
    rel_h: jax.Array,  # [H, N, KH] f32 bias rows (q . get_rel_pos table)
    rel_w: jax.Array,  # [H, N, KW] f32 bias cols; KH * KW == N
    interpret: bool = False,
) -> jax.Array:
    """softmax(q k^T + rel bias) v without materializing [H, N, N] in HBM.

    Returns [H, N, d] in q's dtype.
    """
    h, n, d = q.shape
    kh, kw = rel_h.shape[-1], rel_w.shape[-1]
    assert kh * kw == n, (kh, kw, n)

    dp = -(-d // 128) * 128  # pad head_dim to the lane width
    pad = [(0, 0), (0, 0), (0, dp - d)]
    qp, kp, vp = (jnp.pad(x, pad) for x in (q, k, v))

    # 256-row query blocks: logits tile [256, N] f32 = 4 MB at N=4096
    # (512-row blocks exceed VMEM next to the resident k/v + e matrices)
    bq = n
    for cand in (256, 128):
        if n % cand == 0 and n > cand:
            bq = cand
            break

    eh, ew = _expansion_mats(n, kh, kw, q.dtype)

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((h, n, dp), q.dtype),
        grid=(h, n // bq),  # qi innermost: k/v blocks stay resident per head
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda hh, qi: (hh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, dp), lambda hh, qi: (hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, dp), lambda hh, qi: (hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, kh), lambda hh, qi: (hh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, kw), lambda hh, qi: (hh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, n), lambda hh, qi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kw, n), lambda hh, qi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dp), lambda hh, qi: (hh, qi, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qp, kp, vp, rel_h.astype(eh.dtype), rel_w.astype(eh.dtype), eh, ew)
    return out[:, :, :d]
