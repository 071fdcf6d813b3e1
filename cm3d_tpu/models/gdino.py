"""GroundingDINO (SwinT-OGC) open-vocabulary grounded detection in Flax.

The reference keeps GroundingDINO as its vestigial alternative detector:
the model load and the whole inference path are commented out
(src/kitti/gen_2d_masks_detic.py:115-117 config/checkpoint paths, :633
`load_model(...)`, :192-238 `get_grounding_output1`, :383-447
`get_grounding_output`; src/nuscenes/2d_to_3d.py:18-21 imports the
package but never calls it). This module rebuilds the published
architecture TPU-native so that path is a real capability:

- Swin-T backbone (reuses `cm3d_tpu.models.swin`, embed 96, depths
  2/2/6/2) -> strides 8/16/32 + an extra stride-2 conv level, all
  projected to d_model=256 with GroupNorm(32).
- BERT-base text encoder with GroundingDINO's sub-sentence handling:
  phrase-local attention masks and per-phrase position ids split on the
  special tokens ([CLS]/[SEP]/`.`/`?`), then a `feat_map` Linear to 256.
- Feature enhancer (6 layers): multi-scale deformable image self-attn,
  text self-attn (4 heads), and the bidirectional image<->text fusion
  block (1024-dim, 4 heads, layer-scale gammas).
- Language-guided query selection: top-`num_queries` anchors by max
  text-contrastive logit over the enhanced memory.
- Cross-modality decoder (6 layers): query self-attn, text cross-attn,
  box-conditioned deformable image cross-attn, iterative box refinement
  with inverse-sigmoid deltas.
- ContrastiveEmbed head (parameter-free dot product against the text
  features, padded to max_text_len with -inf).

`ground()` reproduces the `get_grounding_output1` contract: caption ->
(filtered boxes cxcywh-normalized, ["phrase(score)"] via the posmap
decode) with box/text thresholds 0.15/0.15 (kitti
gen_2d_masks_detic.py:697-704).

TPU design notes: all shapes are static (text padded to
cfg.max_text_len, image at cfg.img_hw); control flow is trace-time
Python over fixed layer counts; deformable sampling is 4-corner
bilinear gathers via take_along_axis (arbitrary per-query points defeat
the one-hot-matmul trick used for ROIAlign in detic.py — acceptable:
this model is an offline alternative path, not the production hot
loop). The WordPiece tokenizer is pure host-side Python; the real
bert-base-uncased vocab.txt ships alongside the checkpoint (zero-egress
image: tests use a tiny synthetic vocab).

Deviations (documented; the reference never executes this model, so the
parity target is the published architecture + checkpoint key layout):
- Inference-only, batch of one caption; no denoising/DETR training
  branches, no checkpoint-activation wrappers.
- No image padding masks: the static input is fully valid, so
  valid_ratios == 1 and the mask plumbing collapses.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from cm3d_tpu.models.swin import SwinConfig, SwinTransformer


# ---------------------------------------------------------------------------
# config


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_position: int = 512
    type_vocab: int = 2
    pad_id: int = 0
    cls_id: int = 101
    sep_id: int = 102
    unk_id: int = 100


@dataclasses.dataclass(frozen=True)
class GdinoConfig:
    img_hw: Tuple[int, int] = (800, 1216)  # static network input (H, W)
    d_model: int = 256
    nheads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 2048
    num_queries: int = 900
    n_levels: int = 4
    n_points: int = 4
    max_text_len: int = 256
    # text enhancer (TransformerEncoderLayer for text): 4 heads, ffn 1024
    text_heads: int = 4
    text_ffn: int = 1024
    # fusion (BiAttentionBlock): embed = dim_feedforward // 2, heads = nheads // 2
    fusion_dim: int = 1024
    fusion_heads: int = 4
    swin: SwinConfig = SwinConfig(
        embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
        window_size=7, out_indices=(1, 2, 3),
    )
    bert: BertConfig = BertConfig()
    dtype: str = "float32"  # compute dtype (params stay f32)

    @property
    def head_dim(self) -> int:
        return self.d_model // self.nheads


GDINO_SWINT = GdinoConfig()
GDINO_TEST = GdinoConfig(
    img_hw=(64, 96), d_model=16, nheads=2, enc_layers=2, dec_layers=2,
    dim_feedforward=32, num_queries=12, n_points=2, max_text_len=24,
    text_heads=2, text_ffn=16, fusion_dim=16, fusion_heads=2,
    swin=SwinConfig(embed_dim=8, depths=(1, 1, 1), num_heads=(1, 2, 2),
                    window_size=4, out_indices=(0, 1, 2)),
    bert=BertConfig(vocab_size=64, hidden=16, layers=2, heads=2,
                    intermediate=16, max_position=32),
)

# ImageNet normalization (the commented transform_image,
# kitti/gen_2d_masks_detic.py:165-174)
GDINO_PIXEL_MEAN = (0.485, 0.456, 0.406)
GDINO_PIXEL_STD = (0.229, 0.224, 0.225)


# ---------------------------------------------------------------------------
# WordPiece tokenizer (bert-base-uncased semantics, host-side)


class WordPieceTokenizer:
    """Greedy-longest-match WordPiece with BERT basic tokenization
    (lowercase, strip accents off the ASCII path, split punctuation).
    `vocab` maps token -> id; continuation pieces carry the `##` prefix."""

    def __init__(self, vocab: Dict[str, int], cfg: BertConfig = BertConfig()):
        self.vocab = vocab
        self.inv = {i: t for t, i in vocab.items()}
        self.cfg = cfg

    @classmethod
    def from_file(cls, path: str, cfg: BertConfig = BertConfig()):
        with open(path) as f:
            vocab = {line.rstrip("\n"): i for i, line in enumerate(f)}
        return cls(vocab, cfg)

    @staticmethod
    def _basic(text: str) -> List[str]:
        text = text.lower().strip()
        out: List[str] = []
        word = ""
        for ch in text:
            if ch.isspace():
                if word:
                    out.append(word)
                    word = ""
            elif not ch.isalnum():
                if word:
                    out.append(word)
                    word = ""
                out.append(ch)
            else:
                word += ch
        if word:
            out.append(word)
        return out

    def _wordpiece(self, word: str) -> List[int]:
        unk = self.cfg.unk_id
        pieces: List[int] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = self.vocab[sub]
                    break
                end -= 1
            if cur is None:
                return [unk]
            pieces.append(cur)
            start = end
        return pieces

    def encode(self, caption: str) -> List[int]:
        """[CLS] pieces... [SEP] — the `tokenlizer(caption)` input_ids."""
        ids = [self.cfg.cls_id]
        for w in self._basic(caption):
            ids.extend(self._wordpiece(w))
        ids.append(self.cfg.sep_id)
        return ids

    def decode_piece(self, tid: int) -> str:
        return self.inv.get(tid, "[UNK]")


def prepare_caption(caption: str) -> str:
    """get_grounding_output1 preamble (kitti gen_2d_masks_detic.py:195-198):
    lower, strip, ensure trailing '.'."""
    caption = caption.lower().strip()
    if not caption.endswith("."):
        caption = caption + "."
    return caption


def special_token_masks(
    ids: np.ndarray, cfg: BertConfig, period_id: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """GroundingDINO's generate_masks_with_special_tokens_and_transfer_map
    over one padded id row: phrases are the runs between special tokens
    ([CLS]/[SEP]/'.'); within a phrase tokens attend to each other (plus
    themselves for specials) and position ids restart at 0 per phrase.

    Returns (attn_mask [L, L] bool, position_ids [L] i32,
    token_mask [L] bool = non-pad)."""
    L = len(ids)
    special = (ids == cfg.cls_id) | (ids == cfg.sep_id) | (ids == period_id)
    token_mask = ids != cfg.pad_id
    attn = np.eye(L, dtype=bool)
    pos = np.zeros(L, np.int64)
    prev = 0
    for i in range(L):
        if not token_mask[i]:
            break
        if special[i]:
            prev = i + 1
        else:
            # extend the phrase block [prev, i]
            attn[prev : i + 1, prev : i + 1] = True
            pos[i] = i - prev
    return attn, pos, token_mask


# ---------------------------------------------------------------------------
# BERT text encoder (post-LN, inference)


class BertSelfAttention(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jax.Array, attn_mask: jax.Array) -> jax.Array:
        c, dt = self.cfg, self.dtype
        hd = c.hidden // c.heads

        def heads(name):
            y = nn.Dense(c.hidden, dtype=dt, name=name)(x)
            return y.reshape(*x.shape[:-1], c.heads, hd)

        q, k, v = heads("query"), heads("key"), heads("value")
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        logits = jnp.where(attn_mask[:, None], logits, -1e9)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dt)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return out.reshape(*x.shape[:-1], c.hidden)


class BertLayer(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jax.Array, attn_mask: jax.Array) -> jax.Array:
        c, dt = self.cfg, self.dtype
        a = BertSelfAttention(c, dt, name="self")(x, attn_mask)
        a = nn.Dense(c.hidden, dtype=dt, name="attn_out")(a)
        x = nn.LayerNorm(epsilon=1e-12, name="attn_ln")(x + a)
        h = nn.Dense(c.intermediate, dtype=dt, name="inter")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden, dtype=dt, name="out")(h)
        return nn.LayerNorm(epsilon=1e-12, name="out_ln")(x + h)


class BertEncoder(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(
        self, ids: jax.Array, position_ids: jax.Array, attn_mask: jax.Array
    ) -> jax.Array:
        """ids/position_ids [B, L] i32, attn_mask [B, L, L] bool -> [B, L, H]."""
        c, dt = self.cfg, self.dtype
        word = nn.Embed(c.vocab_size, c.hidden, name="word")(ids)
        pos = nn.Embed(c.max_position, c.hidden, name="position")(position_ids)
        typ = nn.Embed(c.type_vocab, c.hidden, name="token_type")(
            jnp.zeros_like(ids)
        )
        x = nn.LayerNorm(epsilon=1e-12, name="embed_ln")(word + pos + typ).astype(dt)
        for i in range(c.layers):
            x = BertLayer(c, dt, name=f"layer{i}")(x, attn_mask)
        return x


# ---------------------------------------------------------------------------
# positional encodings


def sine_position_hw(h: int, w: int, dim: int, temperature: float = 20.0) -> np.ndarray:
    """PositionEmbeddingSineHW (GroundingDINO uses temperature H=W=20),
    normalized with scale 2*pi: [h*w, dim] (y-emb then x-emb halves)."""
    half = dim // 2
    scale = 2 * math.pi
    eps = 1e-6
    ys = (np.arange(1, h + 1, dtype=np.float32)[:, None] / (h + eps) * scale)
    xs = (np.arange(1, w + 1, dtype=np.float32)[None, :] / (w + eps) * scale)
    ys = np.broadcast_to(ys, (h, w))
    xs = np.broadcast_to(xs, (h, w))
    t = temperature ** (2 * (np.arange(half, dtype=np.float32) // 2) / half)
    py = ys[..., None] / t
    px = xs[..., None] / t
    py = np.stack([np.sin(py[..., 0::2]), np.cos(py[..., 1::2])], axis=-1)
    px = np.stack([np.sin(px[..., 0::2]), np.cos(px[..., 1::2])], axis=-1)
    out = np.concatenate(
        [py.reshape(h, w, -1), px.reshape(h, w, -1)], axis=-1
    )
    return out.reshape(h * w, dim)


def sine_box_embed(boxes: jax.Array, dim_per_coord: int = 128) -> jax.Array:
    """gen_sineembed_for_position: [..., 4] cxcywh in [0,1] ->
    [..., 4*dim_per_coord] (x, y, w, h order; temperature 10000)."""
    scale = 2 * math.pi
    t = 10000.0 ** (
        2 * (jnp.arange(dim_per_coord, dtype=jnp.float32) // 2) / dim_per_coord
    )

    def emb(coord):
        p = coord[..., None] * scale / t
        return jnp.stack(
            [jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1
        ).reshape(*coord.shape, dim_per_coord)

    cx, cy, w, h = (boxes[..., i] for i in range(4))
    return jnp.concatenate([emb(cy), emb(cx), emb(w), emb(h)], axis=-1)


def inverse_sigmoid(x: jax.Array, eps: float = 1e-3) -> jax.Array:
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


# ---------------------------------------------------------------------------
# multi-scale deformable attention


class MSDeformAttn(nn.Module):
    """Deformable attention over the flattened multi-level image memory.

    Sampling is grid_sample-bilinear (align_corners=False, zeros padding)
    done as 4 corner gathers per point via take_along_axis — per-query
    arbitrary points make the detic-style one-hot interpolation matmul
    intractable ([Lq, sum HW] one-hots), so this path trades MXU work for
    gathers; fine for the offline alternative detector."""

    d_model: int
    nheads: int
    n_levels: int
    n_points: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(
        self,
        query: jax.Array,            # [B, Lq, D]
        ref_points: jax.Array,       # [B, Lq, 2] or [B, Lq, 4] (normalized)
        memory: jax.Array,           # [B, Lm, D] flattened levels
        shapes: Sequence[Tuple[int, int]],  # [(H, W)] per level
    ) -> jax.Array:
        D, H, L, P = self.d_model, self.nheads, self.n_levels, self.n_points
        hd = D // H
        dt = self.dtype
        B, Lq, _ = query.shape

        value = nn.Dense(D, dtype=dt, name="value_proj")(memory)
        value = value.reshape(B, -1, H, hd)

        off = nn.Dense(H * L * P * 2, dtype=dt, name="sampling_offsets")(query)
        off = off.reshape(B, Lq, H, L, P, 2)
        w = nn.Dense(H * L * P, dtype=dt, name="attention_weights")(query)
        w = jax.nn.softmax(
            w.reshape(B, Lq, H, L * P).astype(jnp.float32), axis=-1
        ).astype(dt).reshape(B, Lq, H, L, P)

        if ref_points.shape[-1] == 2:
            normalizer = jnp.asarray(
                [[wl, hl] for hl, wl in shapes], jnp.float32
            )  # [L, 2] (x, y)
            loc = (ref_points[:, :, None, None, None, :]
                   + off / normalizer[None, None, None, :, None, :])
        else:
            cxcy = ref_points[..., :2][:, :, None, None, None, :]
            wh = ref_points[..., 2:][:, :, None, None, None, :]
            loc = cxcy + off / P * wh * 0.5

        outs = []
        start = 0
        for l, (hl, wl) in enumerate(shapes):
            v = value[:, start : start + hl * wl]  # [B, HW, H, hd]
            start += hl * wl
            # grid_sample(align_corners=False): pixel coords
            x = loc[:, :, :, l, :, 0] * wl - 0.5  # [B, Lq, H, P]
            y = loc[:, :, :, l, :, 1] * hl - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            acc = 0.0
            for dy in (0, 1):
                for dx in (0, 1):
                    xi = x0 + dx
                    yi = y0 + dy
                    wgt = ((1 - jnp.abs(x - xi)) * (1 - jnp.abs(y - yi)))
                    valid = ((xi >= 0) & (xi < wl) & (yi >= 0) & (yi < hl))
                    idx = (jnp.clip(yi, 0, hl - 1) * wl
                           + jnp.clip(xi, 0, wl - 1)).astype(jnp.int32)
                    # gather: [B, Lq, H, P] indices into [B, HW, H, hd]
                    flat = idx.transpose(0, 2, 1, 3).reshape(B, H, Lq * P)
                    g = jnp.take_along_axis(
                        v.transpose(0, 2, 1, 3),          # [B, H, HW, hd]
                        flat[..., None], axis=2,
                    )                                      # [B, H, Lq*P, hd]
                    g = g.reshape(B, H, Lq, P, hd).transpose(0, 2, 1, 3, 4)
                    acc = acc + g * (wgt * valid)[..., None].astype(dt)
            outs.append(jnp.einsum("bqhp,bqhpd->bqhd", w[:, :, :, l], acc))
        out = sum(outs).reshape(B, Lq, D)
        return nn.Dense(D, dtype=dt, name="output_proj")(out)


# ---------------------------------------------------------------------------
# vanilla multi-head attention (params laid out for in_proj conversion)


class MHA(nn.Module):
    d_model: int
    nheads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, q, k, v, mask: Optional[jax.Array] = None) -> jax.Array:
        hd = self.d_model // self.nheads
        dt = self.dtype

        def split(t, name):
            y = nn.Dense(self.d_model, dtype=dt, name=name)(t)
            return y.reshape(*t.shape[:-1], self.nheads, hd)

        qh, kh, vh = split(q, "wq"), split(k, "wk"), split(v, "wv")
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(hd)
        if mask is not None:
            logits = jnp.where(mask[:, None], logits, -1e9)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dt)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh)
        out = out.reshape(*q.shape[:-1], self.d_model)
        return nn.Dense(self.d_model, dtype=dt, name="out")(out)


class BiAttention(nn.Module):
    """BiMultiHeadAttention: joint image<->text attention computed from one
    logit matrix (image query x text key), softmaxed both ways, with the
    official max-subtraction clamps."""

    d_model: int
    embed_dim: int
    nheads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, vis, txt, txt_mask):
        hd = self.embed_dim // self.nheads
        dt = self.dtype

        def split(t, name):
            y = nn.Dense(self.embed_dim, dtype=dt, name=name)(t)
            return y.reshape(*t.shape[:-1], self.nheads, hd)

        q = split(vis, "v_proj")
        k = split(txt, "l_proj")
        vv = split(vis, "values_v_proj")
        vl = split(txt, "values_l_proj")
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        logits = logits.astype(jnp.float32)
        # official stabilization: subtract max, clamp to [-5e4, 5e4]
        logits = logits - jax.lax.stop_gradient(
            logits.max(axis=(-1, -2), keepdims=True)
        )
        logits = jnp.clip(logits, -50000.0, 50000.0)
        # image->text: softmax over text keys (pad masked out)
        a_v = jax.nn.softmax(
            jnp.where(txt_mask[:, None, None, :], logits, -1e9), axis=-1
        ).astype(dt)
        # text->image: softmax over image keys
        a_l = jax.nn.softmax(logits, axis=-2).astype(dt)
        out_v = jnp.einsum("bhqk,bkhd->bqhd", a_v, vl)
        out_l = jnp.einsum("bhqk,bqhd->bkhd", a_l, vv)
        out_v = out_v.reshape(*vis.shape[:-1], self.embed_dim)
        out_l = out_l.reshape(*txt.shape[:-1], self.embed_dim)
        return (
            nn.Dense(self.d_model, dtype=dt, name="out_v_proj")(out_v),
            nn.Dense(self.d_model, dtype=dt, name="out_l_proj")(out_l),
        )


class FusionLayer(nn.Module):
    """BiAttentionBlock: pre-LN on both streams, bi-attention, residual
    scaled by the learned layer-scale gammas (init 1e-4; droppath is
    identity at inference)."""

    cfg: GdinoConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, vis, txt, txt_mask):
        c, dt = self.cfg, self.dtype
        vn = nn.LayerNorm(epsilon=1e-5, name="layer_norm_v")(vis)
        tn = nn.LayerNorm(epsilon=1e-5, name="layer_norm_l")(txt)
        dv, dl = BiAttention(
            c.d_model, c.fusion_dim, c.fusion_heads, dt, name="attn"
        )(vn, tn, txt_mask)
        gv = self.param("gamma_v", nn.initializers.constant(1e-4),
                        (c.d_model,), jnp.float32)
        gl = self.param("gamma_l", nn.initializers.constant(1e-4),
                        (c.d_model,), jnp.float32)
        return vis + gv * dv, txt + gl * dl


class TextSelfAttnLayer(nn.Module):
    """Post-LN TransformerEncoderLayer on the text stream (4 heads, ffn
    1024), masked with the phrase-local attention mask."""

    cfg: GdinoConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, txt, pos, attn_mask):
        c, dt = self.cfg, self.dtype
        q = txt + pos
        a = MHA(c.d_model, c.text_heads, dt, name="self_attn")(
            q, q, txt, attn_mask
        )
        txt = nn.LayerNorm(epsilon=1e-5, name="norm1")(txt + a)
        h = nn.Dense(c.text_ffn, dtype=dt, name="linear1")(txt)
        h = nn.relu(h)
        h = nn.Dense(c.d_model, dtype=dt, name="linear2")(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(txt + h)


class DeformableEncoderLayer(nn.Module):
    """Image-stream deformable self-attention layer (post-LN, relu FFN)."""

    cfg: GdinoConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, vis, pos, ref_points, shapes):
        c, dt = self.cfg, self.dtype
        a = MSDeformAttn(
            c.d_model, c.nheads, c.n_levels, c.n_points, dt, name="self_attn"
        )(vis + pos, ref_points, vis, shapes)
        vis = nn.LayerNorm(epsilon=1e-5, name="norm1")(vis + a)
        h = nn.Dense(c.dim_feedforward, dtype=dt, name="linear1")(vis)
        h = nn.relu(h)
        h = nn.Dense(c.d_model, dtype=dt, name="linear2")(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(vis + h)


class DecoderLayer(nn.Module):
    """Cross-modality decoder layer: query self-attn -> text cross-attn ->
    box-conditioned deformable image cross-attn -> FFN (post-LN)."""

    cfg: GdinoConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, tgt, query_pos, ref_boxes, memory, shapes, txt,
                 txt_mask):
        c, dt = self.cfg, self.dtype
        q = tgt + query_pos
        a = MHA(c.d_model, c.nheads, dt, name="self_attn")(q, q, tgt)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt + a)
        a = MHA(c.d_model, c.nheads, dt, name="ca_text")(
            tgt + query_pos, txt, txt,
            jnp.broadcast_to(txt_mask[:, None, :],
                             (txt.shape[0], tgt.shape[1], txt.shape[1])),
        )
        tgt = nn.LayerNorm(epsilon=1e-5, name="catext_norm")(tgt + a)
        a = MSDeformAttn(
            c.d_model, c.nheads, c.n_levels, c.n_points, dt, name="cross_attn"
        )(tgt + query_pos, ref_boxes, memory, shapes)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt + a)
        h = nn.Dense(c.dim_feedforward, dtype=dt, name="linear1")(tgt)
        h = nn.relu(h)
        h = nn.Dense(c.d_model, dtype=dt, name="linear2")(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt + h)


class MLP(nn.Module):
    """n-layer relu MLP (DETR-style box head)."""

    hidden: int
    out: int
    n_layers: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_layers - 1):
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype,
                                 name=f"layer{i}")(x))
        return nn.Dense(self.out, dtype=self.dtype,
                        name=f"layer{self.n_layers - 1}")(x)


def contrastive_logits(feat, txt, txt_mask, max_text_len):
    """ContrastiveEmbed: parameter-free dot product, pad tokens and the
    pad-to-max_text_len tail filled with -inf."""
    res = jnp.einsum("bqd,btd->bqt", feat, txt)
    res = jnp.where(txt_mask[:, None, :], res, -jnp.inf)
    pad = res.shape[-1] - max_text_len
    if pad < 0:
        res = jnp.pad(res, ((0, 0), (0, 0), (0, -pad)),
                      constant_values=-jnp.inf)
    return res[..., :max_text_len]


# ---------------------------------------------------------------------------
# full model


class GroundingDino(nn.Module):
    cfg: GdinoConfig = GDINO_SWINT

    @nn.compact
    def __call__(
        self,
        image: jax.Array,          # [B, H, W, 3] ImageNet-normalized
        text_ids: jax.Array,       # [B, Lt] i32, padded with pad_id
        text_pos_ids: jax.Array,   # [B, Lt] i32 per-phrase positions
        text_attn_mask: jax.Array, # [B, Lt, Lt] bool phrase-local
        text_token_mask: jax.Array,  # [B, Lt] bool non-pad
    ) -> Tuple[jax.Array, jax.Array]:
        """-> (pred_logits [B, nq, max_text_len], pred_boxes [B, nq, 4])."""
        c = self.cfg
        dt = jnp.dtype(c.dtype)
        B = image.shape[0]

        # ---- text stream
        bert_out = BertEncoder(c.bert, dt, name="bert")(
            text_ids, text_pos_ids, text_attn_mask
        )
        txt = nn.Dense(c.d_model, dtype=dt, name="feat_map")(bert_out)

        # ---- image stream: Swin -> 4 levels at d_model
        feats = SwinTransformer(c.swin, name="backbone")(image)
        maps = [feats[f"swin{i}"] for i in c.swin.out_indices]
        levels = []
        for i, f in enumerate(maps):
            y = nn.Conv(c.d_model, (1, 1), dtype=dt,
                        name=f"input_proj{i}_conv")(f)
            levels.append(
                nn.GroupNorm(num_groups=32 if c.d_model % 32 == 0 else 1,
                             name=f"input_proj{i}_gn")(y))
        extra = nn.Conv(c.d_model, (3, 3), strides=(2, 2), dtype=dt,
                        name=f"input_proj{len(maps)}_conv")(maps[-1])
        levels.append(
            nn.GroupNorm(num_groups=32 if c.d_model % 32 == 0 else 1,
                         name=f"input_proj{len(maps)}_gn")(extra))
        assert len(levels) == c.n_levels

        shapes = [(f.shape[1], f.shape[2]) for f in levels]
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (c.n_levels, c.d_model), jnp.float32,
        )
        vis = jnp.concatenate(
            [f.reshape(B, -1, c.d_model) for f in levels], axis=1
        )
        pos = jnp.concatenate([
            jnp.asarray(sine_position_hw(h, w, c.d_model), dt)
            + level_embed[l].astype(dt)
            for l, (h, w) in enumerate(shapes)
        ], axis=0)[None]

        # per-level normalized center grids, shared across levels
        # (valid_ratios == 1: the static input has no padding)
        refs = jnp.concatenate([
            jnp.stack(jnp.meshgrid(
                (jnp.arange(w, dtype=jnp.float32) + 0.5) / w,
                (jnp.arange(h, dtype=jnp.float32) + 0.5) / h,
            ), axis=-1).reshape(-1, 2)
            for (h, w) in shapes
        ], axis=0)[None].repeat(B, axis=0)

        # ---- feature enhancer
        for i in range(c.enc_layers):
            vis, txt = FusionLayer(c, dt, name=f"fusion{i}")(
                vis, txt, text_token_mask
            )
            txt = TextSelfAttnLayer(c, dt, name=f"text_layer{i}")(
                txt, jnp.zeros_like(txt), text_attn_mask
            )
            vis = DeformableEncoderLayer(c, dt, name=f"enc_layer{i}")(
                vis, pos, refs, shapes
            )

        # ---- language-guided query selection (two-stage)
        mem = nn.LayerNorm(epsilon=1e-5, name="enc_output_norm")(
            nn.Dense(c.d_model, dtype=dt, name="enc_output")(vis)
        )
        cls = contrastive_logits(mem, txt, text_token_mask, c.max_text_len)
        score = jnp.max(
            jnp.where(jnp.isfinite(cls), cls, -jnp.inf), axis=-1
        )
        _, top_idx = jax.lax.top_k(score, c.num_queries)  # [B, nq]

        # gen_encoder_output_proposals anchors: grid centers with
        # per-level 0.05 * 2^l sizes, cxcywh
        wh = jnp.concatenate([
            jnp.full((h * w, 2), 0.05 * (2.0 ** l), jnp.float32)
            for l, (h, w) in enumerate(shapes)
        ], axis=0)[None].repeat(B, axis=0)
        anchors = jnp.concatenate([refs, wh], axis=-1)  # [B, Lm, 4]
        sel_mem = jnp.take_along_axis(mem, top_idx[..., None], axis=1)
        sel_anchor = jnp.take_along_axis(
            anchors, top_idx[..., None], axis=1
        )
        delta = MLP(c.d_model, 4, 3, dt, name="enc_out_bbox_embed")(sel_mem)
        ref_boxes = jax.nn.sigmoid(
            delta + inverse_sigmoid(sel_anchor)
        )
        ref_boxes = jax.lax.stop_gradient(ref_boxes)

        tgt_embed = self.param(
            "tgt_embed", nn.initializers.normal(1.0),
            (c.num_queries, c.d_model), jnp.float32,
        )
        tgt = jnp.broadcast_to(
            tgt_embed[None].astype(dt), (B, c.num_queries, c.d_model)
        )

        # ---- cross-modality decoder with iterative refinement
        # (ref_point_head is shared across layers, like the official
        # decoder's single MLP)
        ref_head = MLP(c.d_model, c.d_model, 2, dt, name="ref_point_head")
        for i in range(c.dec_layers):
            sine = sine_box_embed(ref_boxes, c.d_model // 2)
            query_pos = ref_head(sine)
            tgt = DecoderLayer(c, dt, name=f"dec_layer{i}")(
                tgt, query_pos, ref_boxes, vis, shapes, txt, text_token_mask
            )
            delta = MLP(c.d_model, 4, 3, dt, name=f"bbox_embed{i}")(tgt)
            ref_boxes = jax.nn.sigmoid(delta + inverse_sigmoid(ref_boxes))

        tgt = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")(tgt)
        logits = contrastive_logits(tgt, txt, text_token_mask, c.max_text_len)
        return logits, ref_boxes


# ---------------------------------------------------------------------------
# host-side grounding contract (get_grounding_output1)


def encode_caption(
    tok: WordPieceTokenizer, caption: str, max_len: int
) -> Dict[str, np.ndarray]:
    """Tokenize + build GroundingDINO's sub-sentence masks, padded to a
    static max_len (TPU static shapes; the official path truncates at
    max_text_len too)."""
    ids = tok.encode(prepare_caption(caption))[:max_len]
    arr = np.full(max_len, tok.cfg.pad_id, np.int32)
    arr[: len(ids)] = ids
    period = tok.vocab.get(".", -1)
    attn, pos, mask = special_token_masks(arr, tok.cfg, period)
    return {
        "ids": arr[None],
        "pos_ids": pos[None].astype(np.int32),
        "attn_mask": attn[None],
        "token_mask": mask[None],
        "n_tokens": len(ids),
    }


def decode_phrase(tok: WordPieceTokenizer, ids: Sequence[int],
                  posmap: np.ndarray) -> str:
    """get_phrases_from_posmap: join the tokens whose logit cleared the
    text threshold, merging ## continuations."""
    words: List[str] = []
    for i in np.nonzero(posmap)[0]:
        piece = tok.decode_piece(int(ids[i]))
        if piece.startswith("##") and words:
            words[-1] += piece[2:]
        else:
            words.append(piece)
    return " ".join(words)


def make_ground_fn(model: GroundingDino, params, tok: WordPieceTokenizer):
    """Returns ground(image_u8, caption, box_threshold, text_threshold) ->
    (boxes [N, 4] cxcywh normalized, ["phrase(score)"]) — the
    get_grounding_output1 contract (kitti gen_2d_masks_detic.py:192-238).
    The jitted trunk is cached per caption length (static shapes)."""
    cfg = model.cfg

    @jax.jit
    def fwd(p, image, ids, pos_ids, attn_mask, token_mask):
        logits, boxes = model.apply(
            {"params": p}, image, ids, pos_ids, attn_mask, token_mask
        )
        return jax.nn.sigmoid(logits[0]), boxes[0]

    def ground(image_u8: np.ndarray, caption: str,
               box_threshold: float = 0.15, text_threshold: float = 0.15):
        h, w = cfg.img_hw
        img = preprocess_gdino(image_u8, (h, w))[None]
        enc = encode_caption(tok, caption, cfg.max_text_len)
        probs, boxes = fwd(
            params, jnp.asarray(img), jnp.asarray(enc["ids"]),
            jnp.asarray(enc["pos_ids"]), jnp.asarray(enc["attn_mask"]),
            jnp.asarray(enc["token_mask"]),
        )
        probs = np.asarray(probs, np.float32)
        probs = np.nan_to_num(probs, neginf=0.0)
        boxes = np.asarray(boxes, np.float32)
        keep = probs.max(axis=1) > box_threshold
        out_boxes = boxes[keep]
        phrases = []
        ids = enc["ids"][0]
        for row in probs[keep]:
            phrase = decode_phrase(tok, ids, row > text_threshold)
            phrases.append(f"{phrase}({str(row.max())[:4]})")
        return out_boxes, phrases

    return ground


def caption_from_vocabulary(
    tok: WordPieceTokenizer, vocabulary: Sequence[str], max_len: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Build the reference's class-list caption ('syn . syn . ...',
    create_text_prompt in cfg/prompt_cfg.py:156-161) plus the per-class
    positive map of the token_spans mode (get_grounding_output,
    kitti/gen_2d_masks_detic.py:419-447: rows average the class's token
    span). Classes that no longer fit under max_len get an all-zero row
    (never selected). Returns (ids [max_len] i32, pos_map [C, max_len])."""
    ids: List[int] = [tok.cfg.cls_id]
    period = tok.vocab.get(".")
    if period is None:
        raise ValueError("tokenizer vocab lacks '.'")
    spans: List[Tuple[int, int]] = []
    for cls in vocabulary:
        pieces: List[int] = []
        for w in tok._basic(cls.lower()):
            pieces.extend(tok._wordpiece(w))
        if len(ids) + len(pieces) + 2 <= max_len:  # room for '.' and [SEP]
            spans.append((len(ids), len(ids) + len(pieces)))
            ids.extend(pieces)
            ids.append(period)
        else:
            spans.append((0, 0))
    ids.append(tok.cfg.sep_id)
    arr = np.full(max_len, tok.cfg.pad_id, np.int32)
    arr[: len(ids)] = ids
    pos_map = np.zeros((len(vocabulary), max_len), np.float32)
    for c, (s, e) in enumerate(spans):
        if e > s:
            pos_map[c, s:e] = 1.0 / (e - s)
    return arr, pos_map


def make_gdino_detector(
    model: GroundingDino, params, tok: WordPieceTokenizer,
    vocabulary: Sequence[str], max_detections: int = 128,
    box_threshold: float = 0.15, max_batch: int = 3,
):
    """Adapt GroundingDINO to the mask-stage detector contract
    (pipelines.masks.MaskModels.detic): frame dict -> (boxes xyxy image
    px [B, N, 4], scores [B, N], class ids [B, N], valid [B, N]).

    Classification follows the reference's token_spans branch
    (logits_for_phrases = positive_map @ logits.T) over the class-list
    caption; box_threshold 0.15 per the commented call site
    (kitti/gen_2d_masks_detic.py:697-704). Host-side letterbox preprocess
    (f32 upload — the offline alternative path; the production Detic ring
    uploads u8)."""
    cfg = model.cfg
    max_detections = min(max_detections, cfg.num_queries)
    arr, pos_map = caption_from_vocabulary(tok, vocabulary, cfg.max_text_len)
    attn, pos_ids, token_mask = special_token_masks(
        arr, tok.cfg, tok.vocab["."]
    )
    gh, gw = cfg.img_hw

    @jax.jit
    def fwd(p, imgs, ids_b, pos_b, attn_b, mask_b):
        logits, boxes = model.apply(
            {"params": p}, imgs, ids_b, pos_b, attn_b, mask_b
        )
        probs = jax.nn.sigmoid(logits)  # [B, nq, Lt]
        phrase = jnp.einsum("bqt,ct->bqc", probs, jnp.asarray(pos_map))
        scores = phrase.max(axis=-1)
        cids = phrase.argmax(axis=-1).astype(jnp.int32)
        top_s, top_i = jax.lax.top_k(scores, max_detections)
        sel = lambda t: jnp.take_along_axis(t, top_i, axis=1)
        return (jnp.take_along_axis(boxes, top_i[..., None], axis=1),
                top_s, sel(cids))

    # max_batch: ONE device call never carries more than this many
    # images. The full 6-camera ring in one fused-Swin dispatch at
    # GDINO_SWINT geometry reproducibly faults the TPU worker (r04
    # bisection, TPU_QUEUE_r04.log: full_fused B=1/2/3 pass, B=6 faults,
    # B=6 unfused passes — the same scale-dependent XLA:TPU codegen fault
    # family as train/bevfusion.py SWIN_T_CAMERA); chunks of <= 3 stay in
    # the validated envelope. The tail chunk pads to max_batch so every
    # call shares one compiled shape.
    tile = lambda a, n: jnp.asarray(  # noqa: E731
        np.broadcast_to(a[None], (n,) + a.shape)
    )

    @jax.jit
    def post(nboxes, scores, cids, scales):
        # cxcywh (normalized) -> xyxy in original-image px, ON DEVICE:
        # detect stays dispatch-only (async) so the caller's SAM-encode
        # dispatch and the batched device_fetch overlap the ~8 s gdino
        # device time instead of blocking on a host sync here (VERDICT
        # r05 item 7; was np post-processing behind per-chunk np.asarray)
        nboxes = nboxes.astype(jnp.float32)
        cx, cy = nboxes[..., 0] * gw, nboxes[..., 1] * gh
        bw, bh = nboxes[..., 2] * gw, nboxes[..., 3] * gh
        xyxy = jnp.stack(
            [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], axis=-1
        ) / scales[:, None, None]
        scores = scores.astype(jnp.float32)
        return xyxy, scores, cids, scores > box_threshold

    def detect(frame):
        images = frame["images"]
        B = len(images)
        imgs = np.stack(
            [preprocess_gdino(im, (gh, gw)) for im in images]
        )
        scales = np.array(
            [min(gh / im.shape[0], gw / im.shape[1]) for im in images],
            np.float32,
        )
        nb = min(max_batch, B)
        outs = []
        for i in range(0, B, nb):
            chunk = imgs[i : i + nb]
            pad = nb - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
                )
            outs.append(fwd(
                params, jnp.asarray(chunk), tile(arr, nb),
                tile(pos_ids.astype(np.int32), nb), tile(attn, nb),
                tile(token_mask, nb),
            ))
        nboxes, scores, cids = (
            jnp.concatenate([o[j] for o in outs])[:B] for j in range(3)
        )
        # returns DEVICE arrays — the mask-stage contract downloads them
        # in one batched transfer (utils.fetch.device_fetch)
        return post(nboxes, scores, cids, jnp.asarray(scales))

    return detect


def _dense(sd, prefix):
    out = {"kernel": np.ascontiguousarray(np.asarray(sd[f"{prefix}.weight"]).T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _conv(sd, prefix):
    return {
        "kernel": np.transpose(np.asarray(sd[f"{prefix}.weight"]), (2, 3, 1, 0)),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _ln(sd, prefix):
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _inproj_mha(sd, prefix, d):
    """torch nn.MultiheadAttention in_proj -> wq/wk/wv/out Dense tree."""
    w = np.asarray(sd[f"{prefix}.in_proj_weight"])
    b = np.asarray(sd[f"{prefix}.in_proj_bias"])
    return {
        "wq": {"kernel": np.ascontiguousarray(w[:d].T), "bias": b[:d]},
        "wk": {"kernel": np.ascontiguousarray(w[d : 2 * d].T),
               "bias": b[d : 2 * d]},
        "wv": {"kernel": np.ascontiguousarray(w[2 * d :].T), "bias": b[2 * d :]},
        "out": _dense(sd, f"{prefix}.out_proj"),
    }


def _deform(sd, prefix):
    return {
        "sampling_offsets": _dense(sd, f"{prefix}.sampling_offsets"),
        "attention_weights": _dense(sd, f"{prefix}.attention_weights"),
        "value_proj": _dense(sd, f"{prefix}.value_proj"),
        "output_proj": _dense(sd, f"{prefix}.output_proj"),
    }


def _mlp(sd, prefix, n_layers):
    return {f"layer{j}": _dense(sd, f"{prefix}.layers.{j}")
            for j in range(n_layers)}


def convert_gdino_params(
    sd: Dict[str, np.ndarray], cfg: GdinoConfig = GDINO_SWINT
) -> dict:
    """Official groundingdino_swint_ogc.pth layout (clean_state_dict
    applied — the 'module.' prefix stripped; the commented load,
    kitti/gen_2d_masks_detic.py:150-157). Duplicated shared heads
    (transformer.decoder.bbox_embed.* aliases of bbox_embed.*) and the
    unused bert.pooler are ignored."""
    from cm3d_tpu.models.convert_detic import convert_swin_params

    d = cfg.d_model
    bc = cfg.bert
    bert: dict = {
        "word": {"embedding": np.asarray(
            sd["bert.embeddings.word_embeddings.weight"])},
        "position": {"embedding": np.asarray(
            sd["bert.embeddings.position_embeddings.weight"])},
        "token_type": {"embedding": np.asarray(
            sd["bert.embeddings.token_type_embeddings.weight"])},
        "embed_ln": _ln(sd, "bert.embeddings.LayerNorm"),
    }
    for i in range(bc.layers):
        p = f"bert.encoder.layer.{i}"
        bert[f"layer{i}"] = {
            "self": {
                "query": _dense(sd, f"{p}.attention.self.query"),
                "key": _dense(sd, f"{p}.attention.self.key"),
                "value": _dense(sd, f"{p}.attention.self.value"),
            },
            "attn_out": _dense(sd, f"{p}.attention.output.dense"),
            "attn_ln": _ln(sd, f"{p}.attention.output.LayerNorm"),
            "inter": _dense(sd, f"{p}.intermediate.dense"),
            "out": _dense(sd, f"{p}.output.dense"),
            "out_ln": _ln(sd, f"{p}.output.LayerNorm"),
        }

    out: dict = {
        "bert": bert,
        "feat_map": _dense(sd, "feat_map"),
        "backbone": convert_swin_params(sd, cfg, prefix="backbone.0."),
        "level_embed": np.asarray(sd["transformer.level_embed"]),
        "enc_output": _dense(sd, "transformer.enc_output"),
        "enc_output_norm": _ln(sd, "transformer.enc_output_norm"),
        "enc_out_bbox_embed": _mlp(sd, "transformer.enc_out_bbox_embed", 3),
        "tgt_embed": np.asarray(sd["transformer.tgt_embed.weight"]),
        "ref_point_head": _mlp(sd, "transformer.decoder.ref_point_head", 2),
        "decoder_norm": _ln(sd, "transformer.decoder.norm"),
    }
    for i in range(cfg.n_levels):
        out[f"input_proj{i}_conv"] = _conv(sd, f"input_proj.{i}.0")
        out[f"input_proj{i}_gn"] = _ln(sd, f"input_proj.{i}.1")
    for i in range(cfg.enc_layers):
        p = f"transformer.encoder.layers.{i}"
        out[f"enc_layer{i}"] = {
            "self_attn": _deform(sd, f"{p}.self_attn"),
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "linear1": _dense(sd, f"{p}.linear1"),
            "linear2": _dense(sd, f"{p}.linear2"),
        }
        p = f"transformer.encoder.text_layers.{i}"
        out[f"text_layer{i}"] = {
            "self_attn": _inproj_mha(sd, f"{p}.self_attn", d),
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "linear1": _dense(sd, f"{p}.linear1"),
            "linear2": _dense(sd, f"{p}.linear2"),
        }
        p = f"transformer.encoder.fusion_layers.{i}"
        out[f"fusion{i}"] = {
            "gamma_v": np.asarray(sd[f"{p}.gamma_v"]),
            "gamma_l": np.asarray(sd[f"{p}.gamma_l"]),
            "layer_norm_v": _ln(sd, f"{p}.layer_norm_v"),
            "layer_norm_l": _ln(sd, f"{p}.layer_norm_l"),
            "attn": {
                k: _dense(sd, f"{p}.attn.{k}")
                for k in ("v_proj", "l_proj", "values_v_proj",
                          "values_l_proj", "out_v_proj", "out_l_proj")
            },
        }
    for i in range(cfg.dec_layers):
        p = f"transformer.decoder.layers.{i}"
        out[f"dec_layer{i}"] = {
            "cross_attn": _deform(sd, f"{p}.cross_attn"),
            "ca_text": _inproj_mha(sd, f"{p}.ca_text", d),
            "self_attn": _inproj_mha(sd, f"{p}.self_attn", d),
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "norm3": _ln(sd, f"{p}.norm3"),
            "catext_norm": _ln(sd, f"{p}.catext_norm"),
            "linear1": _dense(sd, f"{p}.linear1"),
            "linear2": _dense(sd, f"{p}.linear2"),
        }
        out[f"bbox_embed{i}"] = _mlp(sd, f"bbox_embed.{i}", 3)
    return out


def synth_gdino_state_dict(
    cfg: GdinoConfig, rng: np.random.Generator
) -> Dict[str, np.ndarray]:
    """Synthesize the official key layout at cfg's shapes (tests; the real
    checkpoint is unreachable in this environment — SURVEY.md §2.3)."""
    sd: Dict[str, np.ndarray] = {}

    def t(*shape):
        return (rng.standard_normal(shape).astype(np.float32) * 0.05)

    def lin(prefix, dout, din, bias=True):
        sd[f"{prefix}.weight"] = t(dout, din)
        if bias:
            sd[f"{prefix}.bias"] = t(dout)

    def ln(prefix, dim):
        sd[f"{prefix}.weight"] = 1.0 + t(dim)
        sd[f"{prefix}.bias"] = t(dim)

    def mha(prefix, dim):
        sd[f"{prefix}.in_proj_weight"] = t(3 * dim, dim)
        sd[f"{prefix}.in_proj_bias"] = t(3 * dim)
        lin(f"{prefix}.out_proj", dim, dim)

    def deform(prefix, d, H, L, P):
        lin(f"{prefix}.sampling_offsets", H * L * P * 2, d)
        lin(f"{prefix}.attention_weights", H * L * P, d)
        lin(f"{prefix}.value_proj", d, d)
        lin(f"{prefix}.output_proj", d, d)

    def mlp3(prefix, d, hidden, dout):
        lin(f"{prefix}.layers.0", hidden, d)
        lin(f"{prefix}.layers.1", hidden, hidden)
        lin(f"{prefix}.layers.2", dout, hidden)

    # swin backbone
    sw = cfg.swin
    bb = "backbone.0"
    sd[f"{bb}.patch_embed.proj.weight"] = t(sw.embed_dim, 3, sw.patch_size,
                                            sw.patch_size)
    sd[f"{bb}.patch_embed.proj.bias"] = t(sw.embed_dim)
    ln(f"{bb}.patch_embed.norm", sw.embed_dim)
    for i, depth in enumerate(sw.depths):
        dim = sw.stage_dim(i)
        for j in range(depth):
            b = f"{bb}.layers.{i}.blocks.{j}"
            ln(f"{b}.norm1", dim)
            ln(f"{b}.norm2", dim)
            sd[f"{b}.attn.relative_position_bias_table"] = t(
                (2 * sw.window_size - 1) ** 2, sw.num_heads[i]
            )
            lin(f"{b}.attn.qkv", 3 * dim, dim)
            lin(f"{b}.attn.proj", dim, dim)
            lin(f"{b}.mlp.fc1", int(dim * sw.mlp_ratio), dim)
            lin(f"{b}.mlp.fc2", dim, int(dim * sw.mlp_ratio))
        if i < len(sw.depths) - 1:
            ln(f"{bb}.layers.{i}.downsample.norm", 4 * dim)
            sd[f"{bb}.layers.{i}.downsample.reduction.weight"] = t(
                2 * dim, 4 * dim
            )
        if i in sw.out_indices:
            ln(f"{bb}.norm{i}", dim)

    # bert
    bc = cfg.bert
    sd["bert.embeddings.word_embeddings.weight"] = t(bc.vocab_size, bc.hidden)
    sd["bert.embeddings.position_embeddings.weight"] = t(bc.max_position,
                                                         bc.hidden)
    sd["bert.embeddings.token_type_embeddings.weight"] = t(bc.type_vocab,
                                                           bc.hidden)
    ln("bert.embeddings.LayerNorm", bc.hidden)
    for i in range(bc.layers):
        p = f"bert.encoder.layer.{i}"
        for q in ("query", "key", "value"):
            lin(f"{p}.attention.self.{q}", bc.hidden, bc.hidden)
        lin(f"{p}.attention.output.dense", bc.hidden, bc.hidden)
        ln(f"{p}.attention.output.LayerNorm", bc.hidden)
        lin(f"{p}.intermediate.dense", bc.intermediate, bc.hidden)
        lin(f"{p}.output.dense", bc.hidden, bc.intermediate)
        ln(f"{p}.output.LayerNorm", bc.hidden)

    d = cfg.d_model
    lin("feat_map", d, bc.hidden)
    for i in range(cfg.n_levels):
        cin = (sw.stage_dim(sw.out_indices[i]) if i < len(sw.out_indices)
               else sw.stage_dim(sw.out_indices[-1]))
        k = 1 if i < len(sw.out_indices) else 3
        sd[f"input_proj.{i}.0.weight"] = t(d, cin, k, k)
        sd[f"input_proj.{i}.0.bias"] = t(d)
        ln(f"input_proj.{i}.1", d)
    sd["transformer.level_embed"] = t(cfg.n_levels, d)
    for i in range(cfg.enc_layers):
        p = f"transformer.encoder.layers.{i}"
        deform(f"{p}.self_attn", d, cfg.nheads, cfg.n_levels, cfg.n_points)
        ln(f"{p}.norm1", d)
        ln(f"{p}.norm2", d)
        lin(f"{p}.linear1", cfg.dim_feedforward, d)
        lin(f"{p}.linear2", d, cfg.dim_feedforward)
        p = f"transformer.encoder.text_layers.{i}"
        mha(f"{p}.self_attn", d)
        ln(f"{p}.norm1", d)
        ln(f"{p}.norm2", d)
        lin(f"{p}.linear1", cfg.text_ffn, d)
        lin(f"{p}.linear2", d, cfg.text_ffn)
        p = f"transformer.encoder.fusion_layers.{i}"
        sd[f"{p}.gamma_v"] = np.full(d, 1e-4, np.float32)
        sd[f"{p}.gamma_l"] = np.full(d, 1e-4, np.float32)
        ln(f"{p}.layer_norm_v", d)
        ln(f"{p}.layer_norm_l", d)
        for k in ("v_proj", "l_proj", "values_v_proj", "values_l_proj"):
            lin(f"{p}.attn.{k}", cfg.fusion_dim, d)
        for k in ("out_v_proj", "out_l_proj"):
            lin(f"{p}.attn.{k}", d, cfg.fusion_dim)
    lin("transformer.enc_output", d, d)
    ln("transformer.enc_output_norm", d)
    mlp3("transformer.enc_out_bbox_embed", d, d, 4)
    sd["transformer.tgt_embed.weight"] = t(cfg.num_queries, d)
    lin("transformer.decoder.ref_point_head.layers.0", d, 2 * d)
    lin("transformer.decoder.ref_point_head.layers.1", d, d)
    ln("transformer.decoder.norm", d)
    for i in range(cfg.dec_layers):
        p = f"transformer.decoder.layers.{i}"
        deform(f"{p}.cross_attn", d, cfg.nheads, cfg.n_levels, cfg.n_points)
        mha(f"{p}.ca_text", d)
        mha(f"{p}.self_attn", d)
        for n in ("norm1", "norm2", "norm3", "catext_norm"):
            ln(f"{p}.{n}", d)
        lin(f"{p}.linear1", cfg.dim_feedforward, d)
        lin(f"{p}.linear2", d, cfg.dim_feedforward)
        mlp3(f"bbox_embed.{i}", d, d, 4)
    return sd


def preprocess_gdino(image_u8: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """Resize (PIL bilinear equivalent via numpy) + ImageNet-normalize to
    the static network size. The commented reference transform
    (RandomResize([800], max_size=1333)) keeps aspect; the static-shape
    rebuild letterboxes with zeros instead (documented deviation — the
    normalized output boxes refer to the letterboxed frame)."""
    from PIL import Image

    h, w = image_u8.shape[:2]
    oh, ow = out_hw
    scale = min(oh / h, ow / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    im = Image.fromarray(image_u8).resize((nw, nh), Image.BILINEAR)
    canvas = np.zeros((oh, ow, 3), np.float32)
    canvas[:nh, :nw] = np.asarray(im, np.float32) / 255.0
    canvas -= np.asarray(GDINO_PIXEL_MEAN, np.float32)
    canvas /= np.asarray(GDINO_PIXEL_STD, np.float32)
    return canvas
