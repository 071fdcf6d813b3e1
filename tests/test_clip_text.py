"""CLIP text tower: torch-parity of the attention block and tokenizer BPE."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from cm3d_tpu.models.clip_text import (
    CLIP_TEXT_TEST,
    ClipTextEncoder,
    SimpleTokenizer,
    convert_clip_text_params,
    embed_vocabulary,
)

RNG = np.random.default_rng(17)


def _torch_block(width, heads):
    """A torch module replicating CLIP's ResidualAttentionBlock."""
    import torch.nn as tnn

    class QuickGELU(tnn.Module):
        def forward(self, x):
            return x * torch.sigmoid(1.702 * x)

    class Block(tnn.Module):
        def __init__(self):
            super().__init__()
            self.attn = tnn.MultiheadAttention(width, heads, batch_first=False)
            self.ln_1 = tnn.LayerNorm(width)
            self.mlp = tnn.Sequential()
            self.mlp.add_module("c_fc", tnn.Linear(width, width * 4))
            self.mlp.add_module("gelu", QuickGELU())
            self.mlp.add_module("c_proj", tnn.Linear(width * 4, width))
            self.ln_2 = tnn.LayerNorm(width)

        def forward(self, x, mask):
            # x: [seq, batch, width] like CLIP
            y = self.ln_1(x)
            y = self.attn(y, y, y, need_weights=False, attn_mask=mask)[0]
            x = x + y
            x = x + self.mlp(self.ln_2(x))
            return x

    return Block()


def test_attention_block_matches_torch():
    width, heads, n, b = 32, 4, 7, 2
    blk = _torch_block(width, heads)
    x = torch.randn(n, b, width)
    mask = torch.triu(torch.full((n, n), float("-inf")), diagonal=1)
    want = blk(x, mask).detach().numpy().transpose(1, 0, 2)  # -> [B, N, D]

    sd = {
        "transformer.resblocks.0.ln_1.weight": blk.ln_1.weight.detach().numpy(),
        "transformer.resblocks.0.ln_1.bias": blk.ln_1.bias.detach().numpy(),
        "transformer.resblocks.0.ln_2.weight": blk.ln_2.weight.detach().numpy(),
        "transformer.resblocks.0.ln_2.bias": blk.ln_2.bias.detach().numpy(),
        "transformer.resblocks.0.attn.in_proj_weight": blk.attn.in_proj_weight.detach().numpy(),
        "transformer.resblocks.0.attn.in_proj_bias": blk.attn.in_proj_bias.detach().numpy(),
        "transformer.resblocks.0.attn.out_proj.weight": blk.attn.out_proj.weight.detach().numpy(),
        "transformer.resblocks.0.attn.out_proj.bias": blk.attn.out_proj.bias.detach().numpy(),
        "transformer.resblocks.0.mlp.c_fc.weight": blk.mlp.c_fc.weight.detach().numpy(),
        "transformer.resblocks.0.mlp.c_fc.bias": blk.mlp.c_fc.bias.detach().numpy(),
        "transformer.resblocks.0.mlp.c_proj.weight": blk.mlp.c_proj.weight.detach().numpy(),
        "transformer.resblocks.0.mlp.c_proj.bias": blk.mlp.c_proj.bias.detach().numpy(),
    }
    import dataclasses
    from cm3d_tpu.models.clip_text import ResidualAttentionBlock

    cfgdim = width
    mod = ResidualAttentionBlock(width, heads)
    params = convert_clip_text_params(
        {**sd,
         "token_embedding.weight": np.zeros((4, width), np.float32),
         "positional_embedding": np.zeros((4, width), np.float32),
         "text_projection": np.zeros((width, 8), np.float32),
         "ln_final.weight": np.ones(width, np.float32),
         "ln_final.bias": np.zeros(width, np.float32)},
        dataclasses.replace(CLIP_TEXT_TEST, width=width, heads=heads, layers=1),
    )["block0"]
    jmask = jnp.triu(jnp.full((n, n), -jnp.inf), k=1)
    got = np.asarray(
        mod.apply({"params": params}, jnp.asarray(x.numpy().transpose(1, 0, 2)), jmask)
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def _toy_tokenizer():
    merges = [("c", "a</w>"), ("c", "ar</w>"), ("a", "r</w>"), ("ca", "r</w>")]
    return SimpleTokenizer(merges)


def test_tokenizer_bpe_merging():
    tok = _toy_tokenizer()
    ids = tok.encode("ca car")
    # "ca" -> merged token "ca</w>"; "car" -> "ca" + "r</w>" -> "car</w>"
    assert tok.encoder["ca</w>"] in ids
    assert tok.encoder["car</w>"] in ids


def test_tokenize_layout_and_eot():
    tok = _toy_tokenizer()
    arr = tok.tokenize(["car", "ca"], context_length=8)
    assert arr.shape == (2, 8)
    assert (arr[:, 0] == tok.sot).all()
    # eot is the max id and argmax finds it
    assert arr[0].max() == tok.eot


def test_embed_vocabulary_normalized():
    cfg = CLIP_TEXT_TEST
    tok = _toy_tokenizer()
    model = ClipTextEncoder(cfg)
    tokens = jnp.asarray(tok.tokenize(["a car", "a ca"], cfg.context_length))
    params = model.init(jax.random.PRNGKey(0), tokens)["params"]
    clf = embed_vocabulary(params, tok, ["car", "ca"], cfg=cfg)
    assert clf.shape == (cfg.embed_dim, 2)
    np.testing.assert_allclose(np.linalg.norm(clf, axis=0), 1.0, atol=1e-5)
