"""CLIP text encoder (ViT-B/32 text tower) in Flax + BPE tokenizer.

The reference builds Detic's open-vocabulary classifier head by embedding
"a <class>" prompts with CLIP's text encoder
(src/nuscenes/gen_2d_masks_detic.py:44-50,90-96: build_text_encoder ->
normalized 512-d embeddings, transposed into a [512, K] classifier).

Architecture (Radford et al. 2021): token embedding (49408), learned
positional embedding (77), 12 pre-LN transformer blocks (width 512, 8
heads) with causal masking, final LN, projection to 512, L2-normalized
output taken at the EOT token position.

The byte-pair tokenizer loads CLIP's published merges file
(bpe_simple_vocab_16e6.txt.gz) when available; tests exercise it with a toy
merge table.
"""

from __future__ import annotations

import dataclasses
import functools
import gzip
import html
import re
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 512


CLIP_TEXT_B32 = ClipTextConfig()
CLIP_TEXT_TEST = ClipTextConfig(
    vocab_size=512, context_length=16, width=32, heads=2, layers=2, embed_dim=24
)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x: jax.Array, causal_mask: jax.Array) -> jax.Array:
        y = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        b, n, d = y.shape
        head_dim = self.width // self.heads
        # fused in_proj like torch MultiheadAttention
        qkv = nn.Dense(3 * self.width, name="in_proj")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            return jnp.transpose(t.reshape(b, n, self.heads, head_dim), (0, 2, 1, 3))

        q, k, v = split(q), split(k), split(v)
        attn = (q / np.sqrt(head_dim)) @ jnp.swapaxes(k, -2, -1)
        attn = attn + causal_mask
        attn = jax.nn.softmax(attn, axis=-1)
        o = jnp.transpose(attn @ v, (0, 2, 1, 3)).reshape(b, n, d)
        x = x + nn.Dense(self.width, name="out_proj")(o)

        y = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        y = nn.Dense(self.width * 4, name="mlp_fc")(y)
        # CLIP uses QuickGELU: x * sigmoid(1.702 x)
        y = y * jax.nn.sigmoid(1.702 * y)
        x = x + nn.Dense(self.width, name="mlp_proj")(y)
        return x


class ClipTextEncoder(nn.Module):
    cfg: ClipTextConfig = CLIP_TEXT_B32

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        """tokens: [B, context_length] int32 -> normalized [B, embed_dim]."""
        cfg = self.cfg
        tok_emb = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.width),
        )
        pos_emb = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (cfg.context_length, cfg.width),
        )
        x = tok_emb[tokens] + pos_emb[None]
        mask = jnp.triu(
            jnp.full((cfg.context_length, cfg.context_length), -jnp.inf), k=1
        )
        for i in range(cfg.layers):
            x = ResidualAttentionBlock(cfg.width, cfg.heads, name=f"block{i}")(
                x, mask
            )
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        proj = self.param(
            "text_projection",
            nn.initializers.normal(cfg.width ** -0.5),
            (cfg.width, cfg.embed_dim),
        )
        # take features at the EOT token (highest token id per sequence)
        eot = jnp.argmax(tokens, axis=-1)
        feats = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        feats = feats @ proj
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)


def convert_clip_text_params(
    sd: Dict[str, np.ndarray], cfg: ClipTextConfig = CLIP_TEXT_B32
) -> dict:
    """Map a CLIP torch state dict (full model or text tower) to params.

    Accepts keys either bare ("transformer.resblocks...") or prefixed
    with "text_encoder." (Detic's wrapper).
    """
    def g(key):
        for pref in ("", "text_encoder."):
            if pref + key in sd:
                return sd[pref + key]
        raise KeyError(key)

    params: dict = {
        "token_embedding": g("token_embedding.weight"),
        "positional_embedding": g("positional_embedding"),
        "text_projection": g("text_projection"),
        "ln_final": {"scale": g("ln_final.weight"), "bias": g("ln_final.bias")},
    }
    for i in range(cfg.layers):
        p = f"transformer.resblocks.{i}"
        params[f"block{i}"] = {
            "ln_1": {"scale": g(f"{p}.ln_1.weight"), "bias": g(f"{p}.ln_1.bias")},
            "ln_2": {"scale": g(f"{p}.ln_2.weight"), "bias": g(f"{p}.ln_2.bias")},
            "in_proj": {
                "kernel": np.ascontiguousarray(g(f"{p}.attn.in_proj_weight").T),
                "bias": g(f"{p}.attn.in_proj_bias"),
            },
            "out_proj": {
                "kernel": np.ascontiguousarray(g(f"{p}.attn.out_proj.weight").T),
                "bias": g(f"{p}.attn.out_proj.bias"),
            },
            "mlp_fc": {
                "kernel": np.ascontiguousarray(g(f"{p}.mlp.c_fc.weight").T),
                "bias": g(f"{p}.mlp.c_fc.bias"),
            },
            "mlp_proj": {
                "kernel": np.ascontiguousarray(g(f"{p}.mlp.c_proj.weight").T),
                "bias": g(f"{p}.mlp.c_proj.bias"),
            },
        }
    return params


# ---------------------------------------------------------------------------
# Byte-pair tokenizer (CLIP's SimpleTokenizer semantics).
# ---------------------------------------------------------------------------

@functools.lru_cache()
def _bytes_to_unicode() -> Dict[int, str]:
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _basic_clean(text: str) -> str:
    return html.unescape(html.unescape(text)).strip()


def _whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


class SimpleTokenizer:
    """CLIP BPE tokenizer. merges: list of (a, b) string pairs."""

    PATTERN = re.compile(
        r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"
        if False  # regex module unavailable; use an ASCII-equivalent pattern
        else r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+",
        re.IGNORECASE,
    )

    def __init__(self, merges: List[Tuple[str, str]]):
        self.byte_encoder = _bytes_to_unicode()
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for a, b in merges:
            vocab.append(a + b)
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.bpe_ranks = {pair: i for i, pair in enumerate(merges)}
        self.sot = self.encoder["<|startoftext|>"]
        self.eot = self.encoder["<|endoftext|>"]
        self.cache: Dict[str, str] = {}

    @classmethod
    def from_file(cls, bpe_path: str) -> "SimpleTokenizer":
        with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
            lines = f.read().split("\n")
        merges = [tuple(m.split()) for m in lines[1 : 49152 - 256 - 2 + 1]]
        return cls(merges)

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = set(zip(word[:-1], word[1:]))
            bigram = min(
                pairs, key=lambda p: self.bpe_ranks.get(p, float("inf"))
            )
            if bigram not in self.bpe_ranks:
                break
            a, b = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    new_word.append(a + b)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        text = _whitespace_clean(_basic_clean(text)).lower()
        ids: List[int] = []
        for tok in self.PATTERN.findall(text):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(tok).split(" "))
        return ids

    def tokenize(self, texts: List[str], context_length: int = 77) -> np.ndarray:
        out = np.zeros((len(texts), context_length), np.int32)
        for i, t in enumerate(texts):
            ids = [self.sot] + self.encode(t)[: context_length - 2] + [self.eot]
            out[i, : len(ids)] = ids
        return out


def embed_vocabulary(
    params: dict,
    tokenizer: SimpleTokenizer,
    vocabulary: List[str],
    prompt: str = "a ",
    cfg: ClipTextConfig = CLIP_TEXT_B32,
) -> np.ndarray:
    """[embed_dim, K] classifier matrix (reference get_clip_embeddings:44-50,
    which permutes embeddings to [dim, K])."""
    tokens = tokenizer.tokenize([prompt + v for v in vocabulary], cfg.context_length)
    model = ClipTextEncoder(cfg)
    emb = model.apply({"params": params}, jnp.asarray(tokens))
    return np.asarray(emb).T
