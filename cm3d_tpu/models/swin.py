"""Swin Transformer backbone in Flax (Detic's SwinB-896 trunk).

The reference's Detic config is SwinB (patch 4, window 7, dims 128, depths
[2,2,18,2]) feeding an FPN (gen_2d_masks_detic.py:33-34). Implements the
published Swin-v1 semantics: shifted-window attention with relative position
bias, cyclic-shift border masks, patch merging; returns the stage feature
maps the detector's FPN consumes.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from cm3d_tpu.models.common import DenseParams as _DenseParams
from cm3d_tpu.models.common import LNParams as _LNParams


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    patch_size: int = 4
    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 7
    mlp_ratio: float = 4.0
    out_indices: Tuple[int, ...] = (1, 2, 3)  # strides 8, 16, 32
    dtype: str = "float32"  # compute dtype (params stay f32)
    # Fused Pallas window-attention block (kernels/window_attn_pallas.py):
    # absorbs norm1 + qkv + attention + proj, eliminating the window
    # partition/qkv layout copies (~23 ms of Detic batch-6). None = auto
    # (on when the default backend is TPU); "interpret" = CPU interpreter
    # (tests). Param tree is identical either way.
    fused_attn: bool | str | None = None
    # Max tokens per kernel tile (windows per tile G = max_t // win^2).
    # Block-diagonal attention wastes a factor G of MXU flops, so bigger
    # is NOT better once tiles are alignment-saturated. SwinB batch-6
    # backbone sweep (1024x576, bf16, axon v5e): 49 -> 71.1 ms, 98 ->
    # 64.0, 128 -> 63.7, 256 -> 65.7, 384 -> 84.5, 512 -> 81.3
    # (unfused: 91.4 ms).
    fused_group_tokens: int = 128
    # int8 w8a8 MLPs (fc1/fc2 — ops/quant.py, common.QuantDense): the
    # MLPs are ~2/3 of each block's Dense FLOPs and sit OUTSIDE the fused
    # window-attention kernel, so this composes with fused_attn. qkv/proj
    # stay float in BOTH modes — the fused kernel consumes raw float
    # params, and fused_mode() resolves per-backend at runtime, so the
    # param tree must not depend on it. Load transform:
    # quantize_swin_params (checkpoints stay float). Opt-in deviation;
    # on-chip A/B: scripts/ab_detic_int8.py / bench --quant_int8.
    quant_int8: bool = False
    # Rematerialize each block on the backward pass (jax.checkpoint via
    # nn.remat): trades ~1 extra forward of FLOPs for not holding every
    # block's activations — the standard TPU memory lever for TRAINING
    # this backbone (train/bevfusion.py camera branch). No-op for
    # inference (no grad). Param tree is identical either way.
    remat: bool = False

    def stage_dim(self, i: int) -> int:
        return self.embed_dim * (2 ** i)

    def fused_mode(self) -> str:
        """Resolve fused_attn -> 'on' | 'off' | 'interpret'."""
        v = self.fused_attn
        if v is None:
            return "on" if jax.default_backend() == "tpu" else "off"
        if v == "interpret":
            return "interpret"
        return "on" if v else "off"


SWIN_B = SwinConfig()
SWIN_TEST = SwinConfig(
    embed_dim=16, depths=(2, 2), num_heads=(2, 4), window_size=4,
    out_indices=(0, 1),
)


def _rel_pos_index(window: int) -> np.ndarray:
    """[win^2, win^2] index into the (2w-1)^2 relative-position-bias table."""
    coords = np.stack(
        np.meshgrid(np.arange(window), np.arange(window), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return (rel[:, :, 0] * (2 * window - 1) + rel[:, :, 1]).astype(np.int32)


def _shift_attn_mask(hp: int, wp: int, window: int, shift: int) -> np.ndarray:
    """[nW, win^2, win^2] additive mask for shifted windows (0 / -100)."""
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(hp // window, window, wp // window, window)
    win = win.transpose(0, 2, 1, 3).reshape(-1, window * window)
    mask = (win[:, :, None] != win[:, None, :]).astype(np.float32) * -100.0
    return mask


class _WinAttnParams(nn.Module):
    """Window-attention param holder — the same tree an nn.Dense
    qkv/proj + rel_pos_bias_table module stack would create (kernel
    lecun_normal, bias zeros, table normal(0.02)); both the fused Pallas
    branch and the unfused XLA branch (_attn_branch_xla) consume it, so
    there is exactly ONE attention param layout."""

    dim: int
    heads: int
    window: int

    @nn.compact
    def __call__(self):
        wqkv, bqkv = _DenseParams(self.dim, self.dim * 3, name="qkv")()
        wproj, bproj = _DenseParams(self.dim, self.dim, name="proj")()
        table = self.param(
            "rel_pos_bias_table",
            nn.initializers.normal(0.02),
            ((2 * self.window - 1) ** 2, self.heads),
        )
        return wqkv, bqkv, wproj, bproj, table


class SwinBlock(nn.Module):
    dim: int
    heads: int
    window: int
    shift: int
    mlp_ratio: float
    dtype: jnp.dtype = jnp.float32
    fused_mode: str = "off"  # "on" | "off" | "interpret"
    fused_group_tokens: int = 256
    quant: bool = False  # int8 w8a8 MLP (fc1/fc2 only; see SwinConfig)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: [B, H, W, C]."""
        b, h, w, c = x.shape
        window = min(self.window, max(h, w))
        shift = self.shift if window < min(h, w) else 0
        if min(h, w) <= self.window:
            window = min(h, w)  # swin shrinks the window for small maps
            shift = 0

        shortcut = x
        if self.fused_mode != "off":
            x = self._fused_attn(x, window, shift)
        else:
            # same param holders as the fused branch (the ONE tree), same
            # XLA math as the custom_vjp recompute (_attn_branch_xla is
            # the single unfused implementation — no drift surface)
            g_ln, b_ln = _LNParams(c, name="norm1")()
            attn_params = _WinAttnParams(
                self.dim, self.heads, window, name="attn"
            )()
            x = _attn_branch_xla(
                x, (g_ln, b_ln, *attn_params),
                window=window, shift=shift, heads=self.heads,
                dim=self.dim, dtype=self.dtype,
            )
        x = shortcut + x

        from cm3d_tpu.models.common import QuantDense

        dense = QuantDense if self.quant else nn.Dense
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = dense(self.dim, dtype=self.dtype, name="fc2")(y)
        return x + y

    def _fused_attn(self, x, window, shift):
        """norm1 + window attention via the fused Pallas kernel; returns
        the attention branch output [B, H, W, C] (pre-residual). Param
        tree identical to the unfused path (holders mirror the modules).
        Differentiable: _fused_attn_fn's custom_vjp recomputes the
        backward through the XLA branch."""
        c = x.shape[-1]
        g_ln, b_ln = _LNParams(c, name="norm1")()
        wqkv, bqkv, wproj, bproj, table = _WinAttnParams(
            self.dim, self.heads, window, name="attn"
        )()
        f = _fused_attn_fn(
            int(window), int(shift), int(self.heads), int(self.dim),
            jnp.dtype(self.dtype).name, int(self.fused_group_tokens),
            self.fused_mode == "interpret",
        )
        return f(x, (g_ln, b_ln, wqkv, bqkv, wproj, bproj, table))


def _fused_branch_impl(x, params, *, window, shift, heads, dim, dtype,
                       group_tokens, interpret):
    """The fused Pallas attention branch, [B, H, W, C] -> [B, H, W, C]
    (pre-residual): pad/roll/group, expand bias+mask to the kernel's
    interleaved block-diagonal layout, run the kernel, crop back."""
    from cm3d_tpu.kernels.window_attn_pallas import (
        expand_bias_interleaved,
        expand_blockdiag,
        fused_window_attn,
        pick_group,
    )

    g_ln, b_ln, wqkv, bqkv, wproj, bproj, table = params
    b, h, w, c = x.shape
    n = window * window
    pad_b = (window - h % window) % window
    pad_r = (window - w % window) % window
    hp, wp = h + pad_b, w + pad_r
    x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    n_wx = wp // window
    grp = pick_group(n_wx, n, group_tokens)
    n_gx = -(-n_wx // grp)
    pad_g = n_gx * grp * window - wp  # extra whole windows for grouping
    if pad_g:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_g), (0, 0)))

    idx = jnp.asarray(_rel_pos_index(window)).reshape(-1)
    bias = table[idx].reshape(n, n, heads)
    btil = expand_bias_interleaved(
        jnp.transpose(bias, (2, 0, 1)), window, grp
    )
    mtil = None
    if shift > 0:
        mask = jnp.asarray(_shift_attn_mask(hp, wp, window, shift))
        mask = mask.reshape(hp // window, n_wx, n, n)
        if pad_g:
            mask = jnp.pad(
                mask, ((0, 0), (0, n_gx * grp - n_wx), (0, 0), (0, 0))
            )
        mask = mask.reshape(hp // window, n_gx, grp, n, n)
        mtil = expand_blockdiag(mask, window)

    # bounds only matter when window padding introduced zero tokens
    # (reference zeroes them POST-norm; the kernel re-zeroes after its
    # in-kernel LayerNorm). Group padding adds whole garbage windows
    # that are cropped below, so it needs no masking.
    bounds = None if (pad_b == 0 and pad_r == 0) else (h, w, wp, shift)
    out = fused_window_attn(
        x, g_ln, b_ln, wqkv, bqkv, wproj, bproj, btil, mtil,
        win=window, G=grp, heads=heads, dtype=dtype,
        eps=1e-5,  # torch Swin LayerNorm default
        bounds=bounds,
        interpret=interpret,
    )
    out = out[:, :, :wp].astype(dtype)
    if shift > 0:
        out = jnp.roll(out, (shift, shift), axis=(1, 2))
    return out[:, :h, :w]


def _attn_branch_xla(x, params, *, window, shift, heads, dim, dtype):
    """THE unfused attention branch (norm1 -> shifted-window attention ->
    proj), [B, H, W, C] -> [B, H, W, C] pre-residual. Serves double duty:
    SwinBlock's non-TPU forward AND the recompute target for the fused
    kernel's backward (_fused_attn_fn) — one implementation, no drift.
    qkv uses slice + einsum rather than moveaxis/swapaxes: the explicit
    transposes materialized full [B*nW, n, 3, heads, hd] layout copies
    (1.7 ms each at Swin stage 1, batch 6); einsum folds the head
    transposition into the dot itself. Torch-parity pinned by
    tests/test_swin.py::test_swin_block_matches_transformers."""
    g_ln, b_ln, wqkv, bqkv, wproj, bproj, table = params
    b, h, w, c = x.shape
    n = window * window
    head_dim = dim // heads

    # nn.LayerNorm(eps=1e-5): f32 stats (fast variance), f32 result
    # (scale/bias params are f32, so the module's output promotes).
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0
    )
    xn = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * g_ln + b_ln

    pad_b = (window - h % window) % window
    pad_r = (window - w % window) % window
    xn = jnp.pad(xn, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    hp, wp = h + pad_b, w + pad_r
    mask = None
    if shift > 0:
        xn = jnp.roll(xn, (-shift, -shift), axis=(1, 2))
        mask = jnp.asarray(_shift_attn_mask(hp, wp, window, shift))
    xn = xn.reshape(b, hp // window, window, wp // window, window, c)
    xn = jnp.transpose(xn, (0, 1, 3, 2, 4, 5)).reshape(-1, n, c)

    qkv = xn.astype(dtype) @ wqkv.astype(dtype) + bqkv.astype(dtype)
    bnw = qkv.shape[0]
    qkv = qkv.reshape(bnw, n, 3, heads, head_dim)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    attn = jnp.einsum("bqhc,bkhc->bhqk", q * head_dim ** -0.5, k)
    bias = table[jnp.asarray(_rel_pos_index(window)).reshape(-1)]
    attn = attn + jnp.transpose(bias.reshape(n, n, heads), (2, 0, 1))[None]
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(bnw // nw, nw, heads, n, n) + mask[None, :, None]
        attn = attn.reshape(bnw, heads, n, n)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhc->bqhc", attn, v).reshape(bnw, n, dim)
    out = out.astype(dtype) @ wproj.astype(dtype) + bproj.astype(dtype)
    out = out.reshape(b, hp // window, wp // window, window, window, c)
    out = jnp.transpose(out, (0, 1, 3, 2, 4, 5)).reshape(b, hp, wp, c)
    if shift > 0:
        out = jnp.roll(out, (shift, shift), axis=(1, 2))
    return out[:, :h, :w]


@functools.lru_cache(maxsize=None)
def _fused_attn_fn(window, shift, heads, dim, dtype_name, group_tokens,
                   interpret):
    """Differentiable fused attention branch.

    The Pallas kernel has no AD rule; instead of hand-writing a backward
    kernel, the custom_vjp recomputes the branch through the numerically
    equivalent XLA path (_attn_branch_xla) and uses ITS gradient —
    gradient-of-recompute, a la jax.checkpoint, sound because both
    implement the same function (pinned by the fused/unfused parity
    tests). Net effect for training: the forward (and every loss eval)
    keeps the fused kernel's speed; the backward pays one unfused forward
    it would have paid anyway under remat."""
    dtype = jnp.dtype(dtype_name)
    kw = dict(window=window, shift=shift, heads=heads, dim=dim, dtype=dtype)

    @jax.custom_vjp
    def f(x, params):
        return _fused_branch_impl(
            x, params, group_tokens=group_tokens, interpret=interpret, **kw
        )

    def fwd(x, params):
        return f(x, params), (x, params)

    def bwd(res, g):
        x, params = res
        _, vjp = jax.vjp(
            functools.partial(_attn_branch_xla, **kw), x, params
        )
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def quantize_swin_params(params):
    """Float Swin param tree -> the tree SwinConfig.quant_int8=True
    expects: every stage block's fc1/fc2 becomes a QuantDense subtree
    (ops.quant.quantize_dense_params). Attention (qkv/proj), norms, patch
    embed, and merges are untouched — see the SwinConfig.quant_int8
    docstring for why the MLP is the quantization boundary here."""
    from cm3d_tpu.ops.quant import quantize_dense_params

    out = dict(params)
    for name in list(out.keys()):
        if "_block" not in name or not name.startswith("stage"):
            continue
        blk = dict(out[name])
        for k in ("fc1", "fc2"):
            blk[k] = quantize_dense_params(dict(blk[k]))
        out[name] = blk
    return out


def quantize_swin_backbone(params, key: str = "backbone"):
    """Quantize the Swin subtree under `key` of a detector param tree —
    the ONE shared definition of the detector quantization boundary, used
    by both Detic (models/detic.quantize_detic_params) and GroundingDINO
    (pipelines/masks.attach_gdino) so they cannot silently diverge."""
    out = dict(params)
    out[key] = quantize_swin_params(dict(out[key]))
    return out


class PatchMerging(nn.Module):
    dim: int  # input dim
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        pad_b, pad_r = h % 2, w % 2
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype, name="reduction")(x)


class SwinTransformer(nn.Module):
    cfg: SwinConfig = SWIN_B

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        """x: [B, H, W, 3] -> {"swin{i}": [B, H/stride, W/stride, C_i]}."""
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        x = nn.Conv(
            cfg.embed_dim,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            dtype=dt,
            name="patch_embed",
        )(x)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)

        outs: Dict[str, jax.Array] = {}
        fused = cfg.fused_mode()
        block_cls = nn.remat(SwinBlock) if cfg.remat else SwinBlock
        for i, depth in enumerate(cfg.depths):
            dim = cfg.stage_dim(i)
            for j in range(depth):
                x = block_cls(
                    dim,
                    cfg.num_heads[i],
                    cfg.window_size,
                    shift=0 if j % 2 == 0 else cfg.window_size // 2,
                    mlp_ratio=cfg.mlp_ratio,
                    dtype=dt,
                    fused_mode=fused,
                    fused_group_tokens=cfg.fused_group_tokens,
                    quant=cfg.quant_int8,
                    name=f"stage{i}_block{j}",
                )(x)
            if i in cfg.out_indices:
                outs[f"swin{i}"] = nn.LayerNorm(epsilon=1e-5, name=f"out_norm{i}")(x)
            if i < len(cfg.depths) - 1:
                x = PatchMerging(dim, dt, name=f"merge{i}")(x)
        return outs
