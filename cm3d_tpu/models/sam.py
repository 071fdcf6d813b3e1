"""Segment Anything (SAM) in Flax: ViT image encoder, prompt encoder, mask
decoder — the box-prompted mask model of the reference's 2D stage
(src/nuscenes/gen_2d_masks_detic.py:112,248-252,384-398; SamPredictor with
`multimask_output=False`).

Architecture follows the published SAM model (Kirillov et al. 2023):
ViT-H/16 encoder at 1024x1024 with 14x14 window attention and decomposed
relative positions (4 global blocks), 256-d prompt/mask embedding space, a
2-layer two-way transformer decoder. `convert_sam.py` maps the released
torch checkpoint into these modules. All shapes static: boxes arrive padded
[B, P, 4] with a validity mask, so box-prompted inference jits once.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from cm3d_tpu.models.common import (
    LayerNorm2d,
    MLPBlock,
    add_decomposed_rel_pos_bnhc,
    window_partition,
    window_unpartition,
)


@dataclasses.dataclass(frozen=True)
class SamConfig:
    img_size: int = 1024
    patch_size: int = 16
    encoder_dim: int = 1280  # ViT-H
    encoder_depth: int = 32
    encoder_heads: int = 16
    encoder_global_attn: Tuple[int, ...] = (7, 15, 23, 31)
    window_size: int = 14
    out_dim: int = 256  # prompt/mask embedding dim
    decoder_depth: int = 2
    decoder_heads: int = 8
    decoder_mlp_dim: int = 2048
    num_multimask_outputs: int = 3
    dtype: str = "float32"  # compute dtype ("bfloat16" for TPU MXU speed)
    # NOTE: a Pallas flash-attention path for the global (non-windowed)
    # blocks was built and CLOSED as net-negative on v5e (kernel 3x faster
    # in isolation, full encode 105 vs 86 ms at batch-1: the custom-call
    # boundary breaks XLA's elementwise fusions around every block; verified
    # across three operand/layout formulations). Removed after the fused
    # window-attention study also closed — see git history
    # (kernels/flash_attention.py) and README "Closed performance studies".
    # Encode non-square images without padding to the full square. The
    # official SamPredictor pads to img_size x img_size and the padding
    # tokens participate in global attention; skipping them saves ~44% of
    # encoder FLOPs at 1024x576 but is a (small) numerical deviation from
    # the torch model — off by default for parity.
    rect_encode: bool = False
    # Fused Pallas kernel for the WINDOWED encoder blocks
    # (kernels/window_attn_pallas.py fused_window_attn_relpos): absorbs
    # norm1 + qkv + decomposed-rel-pos attention + proj. CLOSED as
    # net-negative on the axon v5e chip (ViT-H 1024^2 bf16 encode:
    # unfused 86.0 ms vs fused 106.6/119.0/115.5 ms at group_tokens=
    # 196/392/980, raised 100 MB VMEM cap, outputs matching to 5e-4) —
    # unlike Swin, the in-kernel q-dependent decomposed-rel-pos bias
    # (Toeplitz select-sums + one-hot expansion matmuls) plus f32
    # LN/softmax VPU work serialized against the MXU outweighs the
    # window-partition copies it removes. Kept opt-in for future chips;
    # "interpret" = CPU interpreter (parity tests). Param tree identical.
    fused_window_attn: bool | str = False
    # max tokens per fused tile (see SwinConfig.fused_group_tokens)
    fused_group_tokens: int = 392
    # int8 w8a8 quantized Dense layers (qkv/proj/MLP) in the ENCODER blocks
    # (ops/quant.py): per-channel int8 weights (load-time transform
    # `quantize_sam_params` — checkpoints stay float) + dynamic per-token
    # int8 activations, s8xs8->s32 on the MXU at 2x the bf16 peak. Covers
    # ~92% of encode FLOPs (the attention einsums, patch conv, and neck
    # stay in the compute dtype; the decoder is untouched). Opt-in: a
    # documented numerical deviation from the torch model — accuracy pinned
    # at test scale (tests/test_quant.py) and A/B'd at production scale
    # (scripts/ab_sam_int8.py).
    quant_int8: bool = False
    # calibrated static activation scales (requires quant_int8): drops
    # the per-token amax reduce — measured 13.9% of the int8 chain time
    # at MLP shapes on-chip (scripts/ab_int8_scales.py). Param tree gains
    # act_scale leaves via calibrate_sam_act_scales after quantization.
    quant_static: bool = False

    def __post_init__(self):
        if self.quant_int8 and self.fused_window_attn:
            raise ValueError(
                "quant_int8 and fused_window_attn are mutually exclusive: "
                "the fused kernel consumes float qkv/proj params"
            )
        if self.quant_static and not self.quant_int8:
            raise ValueError("quant_static requires quant_int8")

    def quant_mode(self) -> bool | str:
        """The MLPBlock/ViTAttention quant= value: False | True | 'static'."""
        if self.quant_int8 and self.quant_static:
            return "static"
        return self.quant_int8

    def fused_mode(self) -> str:
        v = self.fused_window_attn
        if v == "interpret":
            return "interpret"
        return "on" if v else "off"

    @property
    def embed_hw(self) -> int:
        return self.img_size // self.patch_size


SAM_VIT_H = SamConfig()
SAM_VIT_L = SamConfig(encoder_dim=1024, encoder_depth=24, encoder_heads=16,
                      encoder_global_attn=(5, 11, 17, 23))
SAM_VIT_B = SamConfig(encoder_dim=768, encoder_depth=12, encoder_heads=12,
                      encoder_global_attn=(2, 5, 8, 11))
# tiny config for tests
SAM_TEST = SamConfig(img_size=64, encoder_dim=32, encoder_depth=2,
                     encoder_heads=2, encoder_global_attn=(1,), window_size=2,
                     decoder_mlp_dim=64)

# released checkpoint family (sam_vit_{h,l,b}_*.pth share one state-dict
# layout; convert_sam.convert_sam_params is cfg-driven so every size
# converts through the same mapping)
SAM_PRESETS = {"vit_h": SAM_VIT_H, "vit_l": SAM_VIT_L, "vit_b": SAM_VIT_B}


def sam_config_for(size: str) -> SamConfig:
    """Preset lookup for --sam_size CLI flags (vit_h | vit_l | vit_b)."""
    try:
        return SAM_PRESETS[size]
    except KeyError:
        raise ValueError(
            f"unknown SAM size {size!r}; expected one of {sorted(SAM_PRESETS)}"
        ) from None


class ViTAttention(nn.Module):
    dim: int
    heads: int
    input_hw: Tuple[int, int]  # token grid this block sees
    dtype: jnp.dtype = jnp.float32
    # int8 w8a8 qkv/proj (common.QuantDense): False | True | "static"
    quant: bool | str = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        import functools

        from cm3d_tpu.models.common import QuantDense

        dense = (
            functools.partial(
                QuantDense, static_scale=self.quant == "static"
            )
            if self.quant
            else nn.Dense
        )
        b, h, w, _ = x.shape
        head_dim = self.dim // self.heads
        qkv = dense(self.dim * 3, dtype=self.dtype, name="qkv")(
            x.reshape(b, h * w, self.dim)
        )
        qkv = qkv.reshape(b, h * w, 3, self.heads, head_dim)
        # heads stay MINOR ([b, n, heads, hd]): the old transpose to
        # [b*heads, n, hd] materialized full qkv layout copies; einsum
        # contractions below carry the head transposition inside the dots.
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        rel_h = self.param(
            "rel_pos_h", nn.initializers.zeros, (2 * self.input_hw[0] - 1, head_dim)
        )
        rel_w = self.param(
            "rel_pos_w", nn.initializers.zeros, (2 * self.input_hw[1] - 1, head_dim)
        )

        attn = jnp.einsum(
            "bqhc,bkhc->bhqk", q * (head_dim ** -0.5), k
        )  # [b, heads, n, n]
        attn = add_decomposed_rel_pos_bnhc(
            attn, q, rel_h.astype(self.dtype), rel_w.astype(self.dtype),
            (h, w), (h, w),
        )
        # softmax reduction in f32 regardless of compute dtype
        attn = jax.nn.softmax(
            attn.astype(jnp.float32), axis=-1
        ).astype(self.dtype)
        x = jnp.einsum("bhqk,bkhc->bqhc", attn, v).reshape(
            b, h, w, self.dim
        )
        return dense(self.dim, dtype=self.dtype, name="proj")(x)


class _ViTAttnParams(nn.Module):
    """ViTAttention-compatible param holder (fused windowed-block path)."""

    dim: int
    window: int
    head_dim: int

    @nn.compact
    def __call__(self):
        from cm3d_tpu.models.common import DenseParams

        wqkv, bqkv = DenseParams(self.dim, self.dim * 3, name="qkv")()
        wproj, bproj = DenseParams(self.dim, self.dim, name="proj")()
        rel_h = self.param(
            "rel_pos_h", nn.initializers.zeros,
            (2 * self.window - 1, self.head_dim),
        )
        rel_w = self.param(
            "rel_pos_w", nn.initializers.zeros,
            (2 * self.window - 1, self.head_dim),
        )
        return wqkv, bqkv, wproj, bproj, rel_h, rel_w


class ViTBlock(nn.Module):
    dim: int
    heads: int
    window_size: int  # 0 = global attention
    grid_hw: Tuple[int, int]
    dtype: jnp.dtype = jnp.float32
    fused_mode: str = "off"  # windowed blocks: "on" | "off" | "interpret"
    fused_group_tokens: int = 392
    # int8 w8a8 Dense layers (qkv/proj/MLP): False | True | "static"
    quant: bool | str = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        shortcut = x
        if self.window_size > 0 and self.fused_mode != "off":
            x = shortcut + self._fused_windowed(x)
            # quant= threaded even though SamConfig currently rejects
            # quant_int8+fused_window_attn: if that exclusion is ever
            # relaxed to the Swin-style composition (quant MLPs + fused
            # attention), this branch must not silently build a float MLP
            # tree that mismatches quantize_sam_params' output.
            return x + MLPBlock(
                self.dim * 4, self.dim, dtype=self.dtype, quant=self.quant,
                name="mlp"
            )(nn.LayerNorm(epsilon=1e-6, name="norm2")(x))
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.window_size > 0:
            hw = (x.shape[1], x.shape[2])
            x, pad_hw = window_partition(x, self.window_size)
            attn_hw = (self.window_size, self.window_size)
        else:
            attn_hw = self.grid_hw
        x = ViTAttention(
            self.dim, self.heads, attn_hw, self.dtype,
            quant=self.quant, name="attn",
        )(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, hw)
        x = shortcut + x
        x = x + MLPBlock(self.dim * 4, self.dim, dtype=self.dtype,
                         quant=self.quant, name="mlp")(
            nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        )
        return x

    def _fused_windowed(self, x):
        """norm1 + windowed decomposed-rel-pos attention via the fused
        Pallas kernel; returns the attention branch (pre-residual)."""
        from cm3d_tpu.kernels.window_attn_pallas import (
            fused_window_attn_relpos,
            pick_group,
        )
        from cm3d_tpu.models.common import LNParams

        b, h, w, c = x.shape
        win = self.window_size
        g_ln, b_ln = LNParams(c, name="norm1")()
        wqkv, bqkv, wproj, bproj, rel_h, rel_w = _ViTAttnParams(
            self.dim, win, self.dim // self.heads, name="attn"
        )()

        pad_b = (win - h % win) % win
        pad_r = (win - w % win) % win
        hp, wp = h + pad_b, w + pad_r
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        n_wx = wp // win
        grp = pick_group(n_wx, win * win, self.fused_group_tokens)
        n_gx = -(-n_wx // grp)
        pad_g = n_gx * grp * win - wp
        if pad_g:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_g), (0, 0)))
        bounds = None if (pad_b == 0 and pad_r == 0) else (h, w, wp, 0)
        out = fused_window_attn_relpos(
            x, g_ln, b_ln, wqkv, bqkv, wproj, bproj, rel_h, rel_w,
            win=win, G=grp, heads=self.heads, dtype=self.dtype,
            bounds=bounds, interpret=self.fused_mode == "interpret",
        )
        return out[:, :h, :w].astype(self.dtype)


class ImageEncoderViT(nn.Module):
    cfg: SamConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: [B, H, W, 3] normalized image -> [B, h, w, out_dim]."""
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        x = nn.Conv(
            cfg.encoder_dim,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            dtype=dt,
            name="patch_embed",
        )(x)
        hw = cfg.embed_hw
        pos = self.param(
            "pos_embed", nn.initializers.zeros, (1, hw, hw, cfg.encoder_dim)
        )
        gh, gw = x.shape[1], x.shape[2]
        assert gh <= hw and gw <= hw, (gh, gw, hw)
        x = x + pos[:, :gh, :gw]
        fused = cfg.fused_mode()
        for i in range(cfg.encoder_depth):
            wsz = 0 if i in cfg.encoder_global_attn else cfg.window_size
            x = ViTBlock(
                cfg.encoder_dim,
                cfg.encoder_heads,
                wsz,
                (hw, hw),
                dt,
                fused_mode=fused,
                fused_group_tokens=cfg.fused_group_tokens,
                quant=cfg.quant_mode(),
                name=f"block{i}",
            )(x)
        # neck
        x = nn.Conv(cfg.out_dim, (1, 1), use_bias=False, dtype=dt, name="neck_conv1")(x)
        x = LayerNorm2d(name="neck_ln1")(x)
        x = nn.Conv(cfg.out_dim, (3, 3), padding=1, use_bias=False, dtype=dt, name="neck_conv2")(x)
        x = LayerNorm2d(name="neck_ln2")(x)
        return x


class PromptEncoder(nn.Module):
    """Box prompts only (the pipeline never uses point/mask prompts)."""

    cfg: SamConfig

    def setup(self):
        d = self.cfg.out_dim
        self.pe_gaussian = self.param(
            "pe_gaussian", nn.initializers.normal(1.0), (2, d // 2)
        )
        # 4 point types: pos point, neg point, box corner 1, box corner 2
        self.point_embed = self.param(
            "point_embed", nn.initializers.normal(1.0), (4, d)
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, d)
        )

    def _pe_encode(self, coords01: jax.Array) -> jax.Array:
        """Random-fourier positional encoding of [..., 2] coords in [0,1]."""
        coords = 2.0 * coords01 - 1.0
        coords = coords @ self.pe_gaussian
        coords = 2 * jnp.pi * coords
        return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)

    def dense_pe(self) -> jax.Array:
        hw = self.cfg.embed_hw
        grid = (jnp.stack(
            jnp.meshgrid(jnp.arange(hw), jnp.arange(hw), indexing="ij"), -1
        ).astype(jnp.float32) + 0.5) / hw
        # grid[..., 0] is y; encode as (x, y)
        return self._pe_encode(grid[..., ::-1])  # [h, w, d]

    def __call__(
        self, boxes: jax.Array, grid_hw: Tuple[int, int] | None = None
    ) -> Tuple[jax.Array, jax.Array]:
        """boxes: [B, 4] (x0, y0, x1, y1) in input-image pixels.

        Returns (sparse [B, 2, d], dense [B, gh, gw, d]); grid_hw defaults
        to the square embed grid (rect_encode crops it).
        """
        img = self.cfg.img_size
        corners = boxes.reshape(-1, 2, 2) + 0.5
        emb = self._pe_encode(corners / img)
        emb = emb.at[:, 0, :].add(self.point_embed[2])
        emb = emb.at[:, 1, :].add(self.point_embed[3])
        gh, gw = grid_hw or (self.cfg.embed_hw, self.cfg.embed_hw)
        dense = jnp.broadcast_to(
            self.no_mask_embed.reshape(1, 1, 1, -1),
            (boxes.shape[0], gh, gw, self.cfg.out_dim),
        )
        return emb, dense


class Up2x2(nn.Module):
    """2x2 stride-2 transposed conv as matmul + depth-to-space.

    Mathematically identical (each output 2x2 block depends on exactly one
    input pixel: out[2i+di, 2j+dj, o] = sum_c in[i,j,c] * K[di,dj,o,c]),
    but the matmul form runs the MXU at full tilt where XLA's gradient-conv
    lowering of ConvTranspose crawled (~7% util measured). Param tree is
    ConvTranspose(transpose_kernel=True)-compatible: kernel [2, 2, O, I]."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, cin = x.shape
        kernel = self.param(
            "kernel",
            # kernel is [2, 2, out, in]: fan-in must come from the LAST axis
            # (lecun_normal's default in_axis=-2 would scale by out-features).
            nn.initializers.lecun_normal(in_axis=-1, out_axis=-2),
            (2, 2, self.features, cin),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        kmat = jnp.transpose(kernel, (3, 0, 1, 2)).reshape(
            cin, 4 * self.features
        )
        y = x.reshape(-1, cin).astype(self.dtype) @ kmat.astype(self.dtype)
        y = y.reshape(b, h, w, 2, 2, self.features)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(
            b, 2 * h, 2 * w, self.features
        )
        return y + bias.astype(self.dtype)


class DecoderAttention(nn.Module):
    dim: int
    heads: int
    downsample: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        inner = self.dim // self.downsample
        head_dim = inner // self.heads
        qp = nn.Dense(inner, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(inner, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(inner, dtype=self.dtype, name="v_proj")(v)

        def split(x):
            b, n, _ = x.shape
            return jnp.transpose(
                x.reshape(b, n, self.heads, head_dim), (0, 2, 1, 3)
            )

        qh, kh, vh = split(qp), split(kp), split(vp)
        attn = jax.nn.softmax(
            ((qh / np.sqrt(head_dim)) @ jnp.swapaxes(kh, -2, -1)).astype(
                jnp.float32
            ),
            axis=-1,
        ).astype(vh.dtype)
        out = attn @ vh
        b, h, n, d = out.shape
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, h * d)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(out)


class TwoWayBlock(nn.Module):
    dim: int
    heads: int
    mlp_dim: int
    skip_first_layer_pe: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        dt = self.dtype
        if self.skip_first_layer_pe:
            # first layer: attention REPLACES queries (no residual, no PE)
            queries = DecoderAttention(
                self.dim, self.heads, dtype=dt, name="self_attn"
            )(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + DecoderAttention(
                self.dim, self.heads, dtype=dt, name="self_attn"
            )(q, q, queries)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm1")(queries).astype(dt)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DecoderAttention(
            self.dim, self.heads, 2, dtype=dt, name="cross_attn_token_to_image"
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm2")(queries).astype(dt)

        queries = queries + MLPBlock(
            self.mlp_dim, self.dim, act="relu", dtype=dt, name="mlp"
        )(queries)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm3")(queries).astype(dt)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + DecoderAttention(
            self.dim, self.heads, 2, dtype=dt, name="cross_attn_image_to_token"
        )(k, q, queries)
        keys = nn.LayerNorm(epsilon=1e-5, name="norm4")(keys).astype(dt)
        return queries, keys


class TwoWayTransformer(nn.Module):
    cfg: SamConfig

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        key_pe = image_pe.reshape(1, h * w, c)
        key_pe = jnp.broadcast_to(key_pe, keys.shape)
        dt = jnp.dtype(self.cfg.dtype)
        queries = point_embedding.astype(dt)
        keys = keys.astype(dt)
        key_pe = key_pe.astype(dt)
        point_embedding = point_embedding.astype(dt)
        for i in range(self.cfg.decoder_depth):
            queries, keys = TwoWayBlock(
                self.cfg.out_dim,
                self.cfg.decoder_heads,
                self.cfg.decoder_mlp_dim,
                skip_first_layer_pe=(i == 0),
                dtype=dt,
                name=f"layer{i}",
            )(queries, keys, point_embedding, key_pe)
        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + DecoderAttention(
            self.cfg.out_dim, self.cfg.decoder_heads, 2, dtype=dt,
            name="final_attn"
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm_final")(queries).astype(dt)
        return queries, keys


class HyperMLP(nn.Module):
    hidden: int
    out: int
    depth: int = 3
    sigmoid_out: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth - 1):
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype,
                                 name=f"layer{i}")(x))
        x = nn.Dense(self.out, dtype=self.dtype,
                     name=f"layer{self.depth - 1}")(x)
        return jax.nn.sigmoid(x) if self.sigmoid_out else x


class MaskDecoder(nn.Module):
    cfg: SamConfig

    @nn.compact
    def __call__(self, image_embedding, image_pe, sparse_prompt, dense_prompt):
        """Returns (masks [B, num_tokens, 4h, 4w], iou_pred [B, num_tokens])."""
        cfg = self.cfg
        d = cfg.out_dim
        n_mask_tokens = cfg.num_multimask_outputs + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, d))
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0), (n_mask_tokens, d)
        )
        b = sparse_prompt.shape[0]
        tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.broadcast_to(tokens[None], (b, n_mask_tokens + 1, d))
        tokens = jnp.concatenate([tokens, sparse_prompt], axis=1)

        src = image_embedding + dense_prompt
        hs, keys = TwoWayTransformer(cfg, name="transformer")(
            src, image_pe, tokens
        )
        iou_out = hs[:, 0]
        mask_out = hs[:, 1 : 1 + n_mask_tokens]

        dt = jnp.dtype(cfg.dtype)
        h, w = src.shape[1], src.shape[2]
        up = keys.reshape(b, h, w, d)
        up = Up2x2(d // 4, dtype=dt, name="upscale1")(up)
        up = LayerNorm2d(name="upscale_ln")(up).astype(dt)
        up = nn.gelu(up, approximate=False)
        up = Up2x2(d // 8, dtype=dt, name="upscale2")(up)
        up = nn.gelu(up, approximate=False)  # [B, 4h, 4w, d//8]

        hyper = jnp.stack(
            [
                HyperMLP(d, d // 8, dtype=dt, name=f"hyper{i}")(mask_out[:, i])
                for i in range(n_mask_tokens)
            ],
            axis=1,
        )  # [B, n_mask_tokens, d//8]
        # f32 island: the mask logits get thresholded at 0 downstream
        masks = jnp.einsum(
            "bnc,bhwc->bnhw", hyper.astype(jnp.float32),
            up.astype(jnp.float32)
        )
        iou_pred = HyperMLP(d, n_mask_tokens, name="iou_head")(iou_out)
        return masks, iou_pred


class Sam(nn.Module):
    """End-to-end box-prompted SAM (encode once, decode many boxes)."""

    cfg: SamConfig = SAM_VIT_H

    def setup(self):
        self.image_encoder = ImageEncoderViT(self.cfg)
        self.prompt_encoder = PromptEncoder(self.cfg)
        self.mask_decoder = MaskDecoder(self.cfg)

    def encode_image(self, x: jax.Array) -> jax.Array:
        return self.image_encoder(x)

    def decode_boxes(
        self, embedding: jax.Array, boxes: jax.Array, multimask: bool = False
    ):
        """embedding: [h, w, d] (one image); boxes: [P, 4] padded.

        Returns (mask_logits [P, 4h, 4w], iou [P]) for the selected token
        (multimask_output=False -> token 0, reference :397).
        """
        gh, gw = embedding.shape[0], embedding.shape[1]
        sparse, dense = self.prompt_encoder(boxes, (gh, gw))
        # rect embeddings use the top-left crop of the square dense PE: the
        # coordinate space stays the padded img_size square (box prompts
        # normalize by it), the padding rows are simply absent
        image_pe = self.prompt_encoder.dense_pe()[:gh, :gw]
        emb = jnp.broadcast_to(embedding[None], (boxes.shape[0],) + embedding.shape)
        masks, iou = self.mask_decoder(emb, image_pe, sparse, dense)
        if multimask:
            best = jnp.argmax(iou[:, 1:], axis=-1) + 1
            sel = jnp.take_along_axis(masks, best[:, None, None, None], axis=1)[:, 0]
            sel_iou = jnp.take_along_axis(iou, best[:, None], axis=1)[:, 0]
            return sel, sel_iou
        return masks[:, 0], iou[:, 0]

    def __call__(self, image: jax.Array, boxes: jax.Array):
        emb = self.encode_image(image[None])[0]
        return self.decode_boxes(emb, boxes)


def quantize_sam_params(params):
    """Float SAM param tree -> the tree `SamConfig.quant_int8=True` expects.

    One-time load transform (checkpoints/converters stay float): every
    encoder-block Dense (attn qkv/proj, mlp lin1/lin2) becomes a QuantDense
    subtree {kernel_q int8, kernel_scale f32, bias} via
    ops.quant.quantize_dense_params. Patch embed, rel-pos tables, neck,
    prompt encoder, and the mask decoder are untouched. A side benefit on
    multi-chip meshes: the replicated encoder weights shrink 4x vs f32.
    """
    from cm3d_tpu.ops.quant import quantize_dense_params

    enc = dict(params["image_encoder"])
    for name in list(enc.keys()):
        if not name.startswith("block"):
            continue
        blk = dict(enc[name])
        attn = dict(blk["attn"])
        for k in ("qkv", "proj"):
            attn[k] = quantize_dense_params(dict(attn[k]))
        blk["attn"] = attn
        mlp = dict(blk["mlp"])
        for k in ("lin1", "lin2"):
            mlp[k] = quantize_dense_params(dict(mlp[k]))
        blk["mlp"] = mlp
        enc[name] = blk
    out = dict(params)
    out["image_encoder"] = enc
    return out


def calibrate_sam_act_scales(cfg: SamConfig, params, images,
                             margin: float = 1.0):
    """Calibrate static activation scales for a quantized SAM encoder
    (SamConfig.quant_static — see ops/quant.py).

    Runs ONE encode of the DYNAMIC twin (quant_static=False) so every
    layer computes correct outputs while each QuantDense sows its input
    absmax, then bakes ``act_scale`` leaves into the param tree
    (ops.quant.bake_act_scales). ``params``: a quantize_sam_params
    output; ``images``: [B, H, W, 3] preprocessed (normalized f32)
    calibration batch from the DEPLOY distribution — out-of-envelope
    activations clip at inference. Returns the calibrated tree for the
    quant_static=True model.
    """
    from cm3d_tpu.ops.quant import bake_act_scales

    dyn = Sam(dataclasses.replace(cfg, quant_static=False))
    _, state = dyn.apply(
        {"params": params}, images, method=dyn.encode_image,
        mutable=["intermediates"],
    )
    return bake_act_scales(params, state["intermediates"], margin=margin)


SAM_PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
SAM_PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


def preprocess_image(img_hwc_uint8: np.ndarray, img_size: int = 1024) -> np.ndarray:
    """Resize longest side to img_size, normalize, bottom/right zero-pad."""
    from PIL import Image

    h, w = img_hwc_uint8.shape[:2]
    scale = img_size / max(h, w)
    nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
    im = Image.fromarray(img_hwc_uint8).resize((nw, nh), Image.BILINEAR)
    arr = (np.asarray(im, np.float32) - SAM_PIXEL_MEAN) / SAM_PIXEL_STD
    out = np.zeros((img_size, img_size, 3), np.float32)
    out[:nh, :nw] = arr
    return out
