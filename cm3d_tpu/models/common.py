"""Shared transformer building blocks for the 2D-stage models."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


class LayerNorm2d(nn.Module):
    """Channel-wise LayerNorm over NHWC feature maps (SAM's neck norm)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        x = x.astype(jnp.float32)  # stats in f32 under bf16 compute
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        x = (x - mean) / jnp.sqrt(var + self.eps)
        return x * weight + bias


class QuantDense(nn.Module):
    """nn.Dense drop-in with int8 weights + dynamic per-token int8
    activations (w8a8 — ops/quant.py).

    Param tree: kernel_q int8 [in, out], kernel_scale f32 [out], bias f32
    [out] — produced from a float nn.Dense subtree by
    ops.quant.quantize_dense_params at LOAD time, so checkpoints and
    converters stay float and the hot path never touches float weights.
    The contraction runs s8 x s8 -> s32 on the MXU (2x the bf16 peak on
    v5e+); quant/dequant are VPU elementwise work XLA fuses away.
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    use_bias: bool = True
    # static (calibrated) activation scale instead of the per-token amax
    # reduce — the extra `act_scale` param leaf comes from
    # ops.quant.bake_act_scales after a calibration pass of the DYNAMIC
    # model (which this module supports by always sowing its input absmax
    # below; a plain apply drops the sow at zero cost)
    static_scale: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from cm3d_tpu.ops.quant import (
            dynamic_int8_matmul,
            static_int8_matmul,
        )

        din = x.shape[-1]
        w_q = self.param(
            "kernel_q", nn.initializers.zeros, (din, self.features), jnp.int8
        )
        w_scale = self.param(
            "kernel_scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        # calibration capture: recorded only when apply() makes
        # "intermediates" mutable (ops.quant.bake_act_scales reads it)
        self.sow(
            "intermediates", "act_absmax",
            jnp.max(jnp.abs(x.astype(jnp.float32))),
            init_fn=lambda: jnp.zeros((), jnp.float32),
            reduce_fn=jnp.maximum,
        )
        if self.static_scale:
            act_scale = self.param(
                "act_scale", nn.initializers.ones, (), jnp.float32
            )
            return static_int8_matmul(
                x, w_q, w_scale, act_scale, bias, out_dtype=self.dtype
            )
        return dynamic_int8_matmul(x, w_q, w_scale, bias, out_dtype=self.dtype)


class MLPBlock(nn.Module):
    mlp_dim: int
    out_dim: int
    act: str = "gelu"
    dtype: jnp.dtype = jnp.float32  # compute dtype (params stay f32)
    # int8 w8a8 Dense layers (see QuantDense): False | True (dynamic
    # scales) | "static" (calibrated scales)
    quant: bool | str = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        import functools

        dense = (
            functools.partial(
                QuantDense, static_scale=self.quant == "static"
            )
            if self.quant
            else nn.Dense
        )
        x = dense(self.mlp_dim, dtype=self.dtype, name="lin1")(x)
        x = nn.gelu(x, approximate=False) if self.act == "gelu" else nn.relu(x)
        return dense(self.out_dim, dtype=self.dtype, name="lin2")(x)


class LNParams(nn.Module):
    """LayerNorm param holder — same tree as nn.LayerNorm; the fused
    window-attention kernels consume the raw scale/bias."""

    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.dim,)),
            self.param("bias", nn.initializers.zeros, (self.dim,)),
        )


class DenseParams(nn.Module):
    """nn.Dense-compatible param holder."""

    din: int
    dout: int

    @nn.compact
    def __call__(self):
        return (
            self.param(
                "kernel", nn.initializers.lecun_normal(),
                (self.din, self.dout),
            ),
            self.param("bias", nn.initializers.zeros, (self.dout,)),
        )


def window_partition(x: jax.Array, window: int) -> Tuple[jax.Array, Tuple[int, int]]:
    """[B, H, W, C] -> [B*nW, win, win, C] with bottom/right zero padding."""
    b, h, w, c = x.shape
    pad_h = (window - h % window) % window
    pad_w = (window - w % window) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, window, window, c)
    return x, (hp, wp)


def window_unpartition(
    windows: jax.Array, window: int, pad_hw: Tuple[int, int], hw: Tuple[int, int]
) -> jax.Array:
    """Inverse of window_partition (crops the padding)."""
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // (hp * wp // window // window)
    x = windows.reshape(b, hp // window, wp // window, window, window, -1)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def get_rel_pos(q_size: int, k_size: int, rel_pos: jax.Array) -> jax.Array:
    """Select (and if needed interpolate) relative position embeddings.

    rel_pos: [2*max_size - 1, head_dim]. Returns [q_size, k_size, head_dim].
    """
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        # linear interpolation to the needed length. SAM resizes with
        # F.interpolate(mode="linear") — align_corners=False, i.e.
        # half-pixel source positions (i + 0.5) * src/dst - 0.5, NOT an
        # endpoint linspace.
        orig = rel_pos.shape[0]
        pos = (jnp.arange(max_rel_dist) + 0.5) * (orig / max_rel_dist) - 0.5
        pos = jnp.clip(pos, 0, orig - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, orig - 1)
        frac = (pos - lo)[:, None]
        rel_pos = rel_pos[lo] * (1 - frac) + rel_pos[hi] * frac
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


def add_decomposed_rel_pos_bnhc(
    attn: jax.Array,
    q: jax.Array,
    rel_pos_h: jax.Array,
    rel_pos_w: jax.Array,
    q_hw: Tuple[int, int],
    k_hw: Tuple[int, int],
) -> jax.Array:
    """add_decomposed_rel_pos for heads-minor q (no explicit transposes).

    attn: [B, heads, qh*qw, kh*kw]; q: [B, qh*qw, heads, head_dim] — the
    layout the qkv projection emits naturally. The head transposition rides
    inside the bias einsums (dot batch dims) and every reshape merges
    adjacent axes only, so nothing materializes a layout copy.
    """
    qh, qw = q_hw
    kh, kw = k_hw
    rh = get_rel_pos(qh, kh, rel_pos_h)  # [qh, kh, d]
    rw = get_rel_pos(qw, kw, rel_pos_w)  # [qw, kw, d]
    b, _, heads, _ = q.shape
    r_q = q.reshape(b, qh, qw, heads, -1)
    rel_h = jnp.einsum("bhwnc,hkc->bnhwk", r_q, rh).reshape(
        b, heads, qh * qw, kh, 1
    )
    rel_w = jnp.einsum("bhwnc,wkc->bnhwk", r_q, rw).reshape(
        b, heads, qh * qw, 1, kw
    )
    attn = attn.reshape(b, heads, qh * qw, kh, kw)
    attn = attn + rel_h + rel_w
    return attn.reshape(b, heads, qh * qw, kh * kw)


def add_decomposed_rel_pos(
    attn: jax.Array,
    q: jax.Array,
    rel_pos_h: jax.Array,
    rel_pos_w: jax.Array,
    q_hw: Tuple[int, int],
    k_hw: Tuple[int, int],
) -> jax.Array:
    """SAM/ViTDet decomposed relative position bias.

    attn: [B*heads, qh*qw, kh*kw]; q: [B*heads, qh*qw, head_dim].
    """
    qh, qw = q_hw
    kh, kw = k_hw
    rh = get_rel_pos(qh, kh, rel_pos_h)  # [qh, kh, d]
    rw = get_rel_pos(qw, kw, rel_pos_w)  # [qw, kw, d]
    bq = q.shape[0]
    r_q = q.reshape(bq, qh, qw, -1)
    # Keep queries FLAT and split only the minor (key) axis: every reshape
    # below is layout-free, so the adds fuse into one elementwise kernel.
    # The naive 5-D view ([B, qh, qw, kh, kw] with a q split) costs ~4x the
    # whole attention matmul in layout copies on TPU at 4096 tokens.
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, rh).reshape(bq, qh * qw, kh, 1)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, rw).reshape(bq, qh * qw, 1, kw)
    attn = attn.reshape(bq, qh * qw, kh, kw)
    attn = attn + rel_h + rel_w
    return attn.reshape(bq, qh * qw, kh * kw)
