"""Swin backbone: block-level parity against transformers' torch Swin."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from cm3d_tpu.models.swin import (
    SWIN_TEST,
    SwinBlock,
    SwinTransformer,
    _rel_pos_index,
    _shift_attn_mask,
)

# multi-minute model-family/pipeline integration file — excluded from the
# dev tier (`-m "not slow"`); the full suite runs everything
pytestmark = pytest.mark.slow

RNG = np.random.default_rng(23)


def _hf_swin_layer(dim, heads, window, shift, hw):
    from transformers.models.swin.modeling_swin import SwinLayer
    from transformers import SwinConfig as HFSwinConfig

    cfg = HFSwinConfig(
        embed_dim=dim,
        num_heads=[heads],
        depths=[1],
        window_size=window,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0,
        mlp_ratio=4.0,
    )
    try:
        layer = SwinLayer(cfg, dim, hw, heads, drop_path_rate=0.0,
                          shift_size=shift)
    except TypeError:
        layer = SwinLayer(cfg, dim, hw, heads, shift_size=shift)
    layer.eval()
    return layer


def _convert_hf_layer(layer, dim, heads, window):
    """HF SwinLayer -> our SwinBlock params."""
    sd = {k: v.detach().numpy() for k, v in layer.state_dict().items()}
    q = sd["attention.self.query.weight"]
    k = sd["attention.self.key.weight"]
    v = sd["attention.self.value.weight"]
    qb = sd["attention.self.query.bias"]
    kb = sd["attention.self.key.bias"]
    vb = sd["attention.self.value.bias"]
    return {
        "norm1": {"scale": sd["layernorm_before.weight"],
                  "bias": sd["layernorm_before.bias"]},
        "norm2": {"scale": sd["layernorm_after.weight"],
                  "bias": sd["layernorm_after.bias"]},
        "attn": {
            "qkv": {"kernel": np.concatenate([q, k, v], 0).T,
                    "bias": np.concatenate([qb, kb, vb], 0)},
            "proj": {"kernel": sd["attention.output.dense.weight"].T,
                     "bias": sd["attention.output.dense.bias"]},
            "rel_pos_bias_table": sd["attention.self.relative_position_bias_table"],
        },
        "fc1": {"kernel": sd["intermediate.dense.weight"].T,
                "bias": sd["intermediate.dense.bias"]},
        "fc2": {"kernel": sd["output.dense.weight"].T,
                "bias": sd["output.dense.bias"]},
    }


@pytest.mark.parametrize("shift", [0, 2])
def test_swin_block_matches_transformers(shift):
    dim, heads, window = 16, 2, 4
    h = w = 8
    layer = _hf_swin_layer(dim, heads, window, shift, (h, w))
    x = torch.randn(1, h * w, dim)
    with torch.no_grad():
        want = layer(x, (h, w))[0].numpy().reshape(1, h, w, dim)

    params = _convert_hf_layer(layer, dim, heads, window)
    blk = SwinBlock(dim, heads, window, shift=shift, mlp_ratio=4.0)
    got = np.asarray(
        blk.apply({"params": params}, jnp.asarray(x.numpy().reshape(1, h, w, dim)))
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_rel_pos_index_matches_reference_formula():
    idx = _rel_pos_index(3)
    assert idx.shape == (9, 9)
    assert idx.min() >= 0 and idx.max() < 25
    # center-to-center relative offset (0,0) maps to the table middle
    assert idx[4, 4] == 12


def test_shift_mask_blocks_cross_region_attention():
    m = _shift_attn_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    assert (m == 0).any() and (m == -100).any()
    # diagonal always unmasked
    for wi in range(4):
        assert (np.diag(m[wi]) == 0).all()


def test_swin_backbone_shapes():
    cfg = SWIN_TEST
    model = SwinTransformer(cfg)
    x = jnp.asarray(RNG.random((1, 64, 48, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    outs = model.apply({"params": params}, x)
    assert set(outs.keys()) == {"swin0", "swin1"}
    assert outs["swin0"].shape == (1, 16, 12, 16)
    assert outs["swin1"].shape == (1, 8, 6, 32)


def test_swin_handles_non_window_divisible_input():
    cfg = SWIN_TEST
    model = SwinTransformer(cfg)
    x = jnp.asarray(RNG.random((1, 52, 36, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    outs = model.apply({"params": params}, x)
    assert outs["swin0"].shape == (1, 13, 9, 16)


@pytest.mark.parametrize("hw", [(64, 48), (52, 36)])
def test_fused_window_attn_full_model_parity(hw):
    """Fused Pallas path (interpret mode) == unfused flax path on the FULL
    backbone, same param tree — window padding, shifted blocks, patch
    merging all exercised. (52, 36) makes every stage pad."""
    import dataclasses as dc

    cfg = SWIN_TEST
    model = SwinTransformer(cfg)
    model_fused = SwinTransformer(dc.replace(cfg, fused_attn="interpret"))
    x = jnp.asarray(RNG.random((2, *hw, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    # identical param trees: fused init must produce the same structure
    pf = model_fused.init(jax.random.PRNGKey(1), x)["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(pf)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(pf),
    ):
        assert a.shape == b.shape, (ka, a.shape, b.shape)

    ref = model.apply({"params": params}, x)
    got = model_fused.apply({"params": params}, x)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), rtol=2e-4, atol=2e-4
        )


def test_fused_window_attn_under_vmap():
    """The Detic camera-ring vmap must fold into the kernel grid."""
    import dataclasses as dc

    cfg = dc.replace(SWIN_TEST, fused_attn="interpret")
    model = SwinTransformer(cfg)
    x = jnp.asarray(RNG.random((3, 1, 32, 24, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x[0])["params"]
    out_v = jax.vmap(
        lambda xi: model.apply({"params": params}, xi)
    )(x)
    for i in range(3):
        out_i = model.apply({"params": params}, x[i])
        for k in out_i:
            np.testing.assert_allclose(
                np.asarray(out_v[k][i]), np.asarray(out_i[k]),
                rtol=2e-4, atol=2e-4,
            )


@pytest.mark.parametrize("hw", [(32, 24), (29, 22)])
def test_fused_window_attn_gradients(hw):
    """The fused branch differentiates: its custom_vjp recomputes the
    backward through the XLA branch (models/swin.py _fused_attn_fn), so
    gradients through the FULL backbone must match the unfused path's.
    (29, 22) forces window padding (the bounds/masked-LN kernel path)."""
    import dataclasses as dc

    cfg = SWIN_TEST
    model = SwinTransformer(cfg)
    model_fused = SwinTransformer(dc.replace(cfg, fused_attn="interpret"))
    x = jnp.asarray(RNG.random((1, *hw, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(2), x)["params"]

    def loss(m):
        def f(p, xi):
            outs = m.apply({"params": p}, xi)
            return sum(jnp.sum(v * v) for v in outs.values())
        return f

    ref_l, ref_g = jax.value_and_grad(loss(model), argnums=(0, 1))(params, x)
    got_l, got_g = jax.value_and_grad(loss(model_fused), argnums=(0, 1))(
        params, x
    )
    # loss values come from different forward implementations
    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=2e-4)
    # gradients: fused bwd = grad of the XLA recompute, which mirrors the
    # unfused path op for op -> tight tolerance
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(got_g),
        jax.tree_util.tree_leaves_with_path(ref_g),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4,
            err_msg=str(kp),
        )


def test_fused_window_attn_grad_under_vmap():
    """vmap(grad(.)) — the BEVFusion camera-ring training composition —
    over the fused branch."""
    import dataclasses as dc

    cfg = dc.replace(SWIN_TEST, fused_attn="interpret")
    model = SwinTransformer(cfg)
    model_ref = SwinTransformer(dc.replace(cfg, fused_attn=False))
    x = jnp.asarray(RNG.random((2, 1, 16, 16, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(3), x[0])["params"]

    def gfn(m):
        return jax.vmap(
            jax.grad(
                lambda xi: sum(
                    jnp.sum(v) for v in m.apply({"params": params}, xi
                                               ).values()
                )
            )
        )

    got = gfn(model)(x)
    ref = gfn(model_ref)(x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-4
    )
