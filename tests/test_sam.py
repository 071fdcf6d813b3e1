"""SAM flax model: op-level torch conversion parity + tiny end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from cm3d_tpu.models import sam as sam_mod
from cm3d_tpu.models.common import add_decomposed_rel_pos, window_partition, window_unpartition
from cm3d_tpu.models.convert_sam import convert_sam_params, _conv, _convT, _dense
from cm3d_tpu.models.sam import SAM_TEST, Sam, SamConfig

RNG = np.random.default_rng(13)


def _np(t):
    return t.detach().numpy()


def test_dense_conversion_matches_torch():
    lin = torch.nn.Linear(6, 10)
    x = torch.randn(3, 6)
    want = _np(lin(x))
    sd = {"w.weight": _np(lin.weight), "w.bias": _np(lin.bias)}
    import flax.linen as nn

    mod = nn.Dense(10)
    params = {"params": _dense(sd, "w")}
    got = np.asarray(mod.apply(params, jnp.asarray(_np(x))))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv_conversion_matches_torch():
    conv = torch.nn.Conv2d(3, 8, 16, stride=16)
    x = torch.randn(1, 3, 64, 64)
    want = _np(conv(x)).transpose(0, 2, 3, 1)  # NCHW -> NHWC
    sd = {"c.weight": _np(conv.weight), "c.bias": _np(conv.bias)}
    import flax.linen as nn

    mod = nn.Conv(8, (16, 16), strides=(16, 16))
    params = {"params": _conv(sd, "c")}
    got = np.asarray(mod.apply(params, jnp.asarray(_np(x).transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_convtranspose_conversion_matches_torch():
    convt = torch.nn.ConvTranspose2d(6, 4, 2, stride=2)
    x = torch.randn(1, 6, 5, 7)
    want = _np(convt(x)).transpose(0, 2, 3, 1)
    sd = {"c.weight": _np(convt.weight), "c.bias": _np(convt.bias)}
    import flax.linen as nn

    mod = nn.ConvTranspose(4, (2, 2), strides=(2, 2), transpose_kernel=True)
    params = {"params": _convT(sd, "c")}
    got = np.asarray(mod.apply(params, jnp.asarray(_np(x).transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_window_partition_roundtrip():
    x = jnp.asarray(RNG.random((2, 13, 9, 4)).astype(np.float32))
    win, pad_hw = window_partition(x, 4)
    assert win.shape == (2 * 4 * 3, 4, 4, 4)
    back = window_unpartition(win, 4, pad_hw, (13, 9))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_decomposed_rel_pos_matches_torch_reference():
    """Check against a literal torch transcription of ViTDet's formula."""
    bh, qh, qw, kh, kw, d = 2, 3, 4, 3, 4, 5
    attn = RNG.random((bh, qh * qw, kh * kw)).astype(np.float32)
    q = RNG.random((bh, qh * qw, d)).astype(np.float32)
    rel_h = RNG.random((2 * qh - 1, d)).astype(np.float32)
    rel_w = RNG.random((2 * qw - 1, d)).astype(np.float32)

    got = np.asarray(
        add_decomposed_rel_pos(
            jnp.asarray(attn), jnp.asarray(q), jnp.asarray(rel_h),
            jnp.asarray(rel_w), (qh, qw), (kh, kw),
        )
    )

    # torch reference
    tq = torch.from_numpy(q).reshape(bh, qh, qw, d)
    q_coords = torch.arange(qh)[:, None]
    k_coords = torch.arange(kh)[None, :]
    rel = (q_coords - k_coords) + (kh - 1)
    Rh = torch.from_numpy(rel_h)[rel.long()]
    q_coords = torch.arange(qw)[:, None]
    k_coords = torch.arange(kw)[None, :]
    rel = (q_coords - k_coords) + (kw - 1)
    Rw = torch.from_numpy(rel_w)[rel.long()]
    rel_h_t = torch.einsum("bhwc,hkc->bhwk", tq, Rh)
    rel_w_t = torch.einsum("bhwc,wkc->bhwk", tq, Rw)
    want = (
        torch.from_numpy(attn).view(bh, qh, qw, kh, kw)
        + rel_h_t[:, :, :, :, None]
        + rel_w_t[:, :, :, None, :]
    ).view(bh, qh * qw, kh * kw)
    np.testing.assert_allclose(got, _np(want), atol=1e-5)


def _fake_torch_sd(cfg: SamConfig):
    """Fabricate a checkpoint-layout state dict with correct shapes."""
    sd = {}
    r = np.random.default_rng(0)

    def add(name, *shape):
        sd[name] = (r.standard_normal(shape) * 0.05).astype(np.float32)

    d = cfg.encoder_dim
    add("image_encoder.patch_embed.proj.weight", d, 3, cfg.patch_size, cfg.patch_size)
    add("image_encoder.patch_embed.proj.bias", d)
    add("image_encoder.pos_embed", 1, cfg.embed_hw, cfg.embed_hw, d)
    for i in range(cfg.encoder_depth):
        p = f"image_encoder.blocks.{i}"
        add(f"{p}.norm1.weight", d); add(f"{p}.norm1.bias", d)
        add(f"{p}.norm2.weight", d); add(f"{p}.norm2.bias", d)
        add(f"{p}.attn.qkv.weight", 3 * d, d); add(f"{p}.attn.qkv.bias", 3 * d)
        add(f"{p}.attn.proj.weight", d, d); add(f"{p}.attn.proj.bias", d)
        size = cfg.embed_hw if i in cfg.encoder_global_attn else cfg.window_size
        add(f"{p}.attn.rel_pos_h", 2 * size - 1, d // cfg.encoder_heads)
        add(f"{p}.attn.rel_pos_w", 2 * size - 1, d // cfg.encoder_heads)
        add(f"{p}.mlp.lin1.weight", 4 * d, d); add(f"{p}.mlp.lin1.bias", 4 * d)
        add(f"{p}.mlp.lin2.weight", d, 4 * d); add(f"{p}.mlp.lin2.bias", d)
    od = cfg.out_dim
    add("image_encoder.neck.0.weight", od, d, 1, 1)
    add("image_encoder.neck.1.weight", od); add("image_encoder.neck.1.bias", od)
    add("image_encoder.neck.2.weight", od, od, 3, 3)
    add("image_encoder.neck.3.weight", od); add("image_encoder.neck.3.bias", od)

    add("prompt_encoder.pe_layer.positional_encoding_gaussian_matrix", 2, od // 2)
    for i in range(4):
        add(f"prompt_encoder.point_embeddings.{i}.weight", 1, od)
    add("prompt_encoder.no_mask_embed.weight", 1, od)

    nm = cfg.num_multimask_outputs + 1
    add("mask_decoder.iou_token.weight", 1, od)
    add("mask_decoder.mask_tokens.weight", nm, od)
    for i in range(cfg.decoder_depth):
        p = f"mask_decoder.transformer.layers.{i}"
        for attn, ds in [("self_attn", 1), ("cross_attn_token_to_image", 2),
                         ("cross_attn_image_to_token", 2)]:
            inner = od // ds
            add(f"{p}.{attn}.q_proj.weight", inner, od); add(f"{p}.{attn}.q_proj.bias", inner)
            add(f"{p}.{attn}.k_proj.weight", inner, od); add(f"{p}.{attn}.k_proj.bias", inner)
            add(f"{p}.{attn}.v_proj.weight", inner, od); add(f"{p}.{attn}.v_proj.bias", inner)
            add(f"{p}.{attn}.out_proj.weight", od, inner); add(f"{p}.{attn}.out_proj.bias", od)
        for n in ["norm1", "norm2", "norm3", "norm4"]:
            add(f"{p}.{n}.weight", od); add(f"{p}.{n}.bias", od)
        add(f"{p}.mlp.lin1.weight", cfg.decoder_mlp_dim, od)
        add(f"{p}.mlp.lin1.bias", cfg.decoder_mlp_dim)
        add(f"{p}.mlp.lin2.weight", od, cfg.decoder_mlp_dim)
        add(f"{p}.mlp.lin2.bias", od)
    p = "mask_decoder.transformer.final_attn_token_to_image"
    inner = od // 2
    add(f"{p}.q_proj.weight", inner, od); add(f"{p}.q_proj.bias", inner)
    add(f"{p}.k_proj.weight", inner, od); add(f"{p}.k_proj.bias", inner)
    add(f"{p}.v_proj.weight", inner, od); add(f"{p}.v_proj.bias", inner)
    add(f"{p}.out_proj.weight", od, inner); add(f"{p}.out_proj.bias", od)
    add("mask_decoder.transformer.norm_final_attn.weight", od)
    add("mask_decoder.transformer.norm_final_attn.bias", od)
    add("mask_decoder.output_upscaling.0.weight", od, od // 4, 2, 2)
    add("mask_decoder.output_upscaling.0.bias", od // 4)
    add("mask_decoder.output_upscaling.1.weight", od // 4)
    add("mask_decoder.output_upscaling.1.bias", od // 4)
    add("mask_decoder.output_upscaling.3.weight", od // 4, od // 8, 2, 2)
    add("mask_decoder.output_upscaling.3.bias", od // 8)
    for i in range(nm):
        p = f"mask_decoder.output_hypernetworks_mlps.{i}"
        add(f"{p}.layers.0.weight", od, od); add(f"{p}.layers.0.bias", od)
        add(f"{p}.layers.1.weight", od, od); add(f"{p}.layers.1.bias", od)
        add(f"{p}.layers.2.weight", od // 8, od); add(f"{p}.layers.2.bias", od // 8)
    p = "mask_decoder.iou_prediction_head"
    add(f"{p}.layers.0.weight", od, od); add(f"{p}.layers.0.bias", od)
    add(f"{p}.layers.1.weight", od, od); add(f"{p}.layers.1.bias", od)
    add(f"{p}.layers.2.weight", nm, od); add(f"{p}.layers.2.bias", nm)
    return sd


def test_tiny_sam_converts_and_runs():
    cfg = SAM_TEST
    sd = _fake_torch_sd(cfg)
    params = convert_sam_params(sd, cfg)
    model = Sam(cfg)

    img = jnp.asarray(RNG.random((cfg.img_size, cfg.img_size, 3)).astype(np.float32))
    boxes = jnp.asarray(
        np.array([[4, 4, 30, 40], [10, 10, 20, 20]], np.float32)
    )
    masks, iou = model.apply({"params": params}, img, boxes)
    assert masks.shape == (2, cfg.embed_hw * 4, cfg.embed_hw * 4)
    assert iou.shape == (2,)
    assert np.isfinite(np.asarray(masks)).all()

    # structural check: converted params exactly match the module's init tree
    init = model.init(jax.random.PRNGKey(0), img, boxes)["params"]
    init_shapes = jax.tree.map(lambda x: x.shape, init)
    conv_shapes = jax.tree.map(lambda x: np.asarray(x).shape, params)
    assert jax.tree.all(
        jax.tree.map(lambda a, b: a == b, init_shapes, conv_shapes)
    ), f"{init_shapes}\n!=\n{conv_shapes}"


def test_sam_size_presets_convert_and_resolve():
    """--sam_size wiring: the cfg-driven converter handles non-ViT-H
    shapes (deeper stack, different global-attn indexes — a tiny vit_l-like
    stand-in here), and sam_config_for resolves the released family."""
    import dataclasses

    from cm3d_tpu.models.sam import (
        SAM_VIT_B, SAM_VIT_H, SAM_VIT_L, sam_config_for,
    )

    assert sam_config_for("vit_h") is SAM_VIT_H
    assert sam_config_for("vit_l") is SAM_VIT_L
    assert sam_config_for("vit_b") is SAM_VIT_B
    assert (SAM_VIT_H.encoder_depth, SAM_VIT_L.encoder_depth,
            SAM_VIT_B.encoder_depth) == (32, 24, 12)
    with pytest.raises(ValueError, match="vit_b"):
        sam_config_for("vit_xl")

    cfg = dataclasses.replace(SAM_TEST, encoder_depth=3,
                              encoder_global_attn=(0, 2))
    params = convert_sam_params(_fake_torch_sd(cfg), cfg)
    model = Sam(cfg)
    img = jnp.asarray(RNG.random((cfg.img_size, cfg.img_size, 3)).astype(np.float32))
    boxes = jnp.asarray(np.array([[4, 4, 30, 40]], np.float32))
    masks, iou = model.apply({"params": params}, img, boxes)
    assert masks.shape == (1, cfg.embed_hw * 4, cfg.embed_hw * 4)
    assert np.isfinite(np.asarray(masks)).all()
    init_shapes = jax.tree.map(
        lambda x: x.shape, model.init(jax.random.PRNGKey(0), img, boxes)["params"]
    )
    conv_shapes = jax.tree.map(lambda x: np.asarray(x).shape, params)
    assert jax.tree.all(jax.tree.map(lambda a, b: a == b, init_shapes,
                                     conv_shapes))


def test_prompt_encoder_corners_differ():
    cfg = SAM_TEST
    sd = _fake_torch_sd(cfg)
    params = convert_sam_params(sd, cfg)
    model = Sam(cfg)
    boxes = jnp.asarray(np.array([[4.0, 4, 30, 40]], np.float32))

    def f(m, b):
        sparse, dense = m.prompt_encoder(b)
        return sparse, dense, m.prompt_encoder.dense_pe()

    sparse, dense, pe = model.apply({"params": params}, boxes, method=f)
    assert sparse.shape == (1, 2, cfg.out_dim)
    assert dense.shape == (1, cfg.embed_hw, cfg.embed_hw, cfg.out_dim)
    assert pe.shape == (cfg.embed_hw, cfg.embed_hw, cfg.out_dim)
    assert not np.allclose(np.asarray(sparse[0, 0]), np.asarray(sparse[0, 1]))


def test_rect_encode_square_input_exact_and_rect_deviation_pinned():
    """rect_encode semantics pinned (VERDICT round-2 next #2):
    (a) on an exactly-square input the rect path IS the square path
        (same tokens, bit-identical embeddings);
    (b) on a rect input the deviation from the square-pad path is REAL —
        0.36 rel err at SAM_TEST scale here; at production ViT-H scale
        measured on-chip (scripts/measure_rect_encode.py, 3 seeds):
        emb rel err 0.072, cosine 0.997, decode-logit RMS 4.7% of the
        logit spread. Zero-pad tokens carry genuine attention mass, and
        without real checkpoints that deviation can't be bounded in mask
        IoU, so rect_encode stays opt-in (default False) even though it
        saves ~35% of encode time (88.6 -> 57.4 ms bf16).
    """
    import dataclasses as dc

    rng = np.random.default_rng(7)
    cfg = SAM_TEST
    model_sq = Sam(cfg)
    model_rc = Sam(dc.replace(cfg, rect_encode=True))
    params = model_sq.init(
        jax.random.PRNGKey(0), jnp.zeros((cfg.img_size, cfg.img_size, 3)),
        jnp.zeros((1, 4)),
    )["params"]

    def enc(model, x):
        return np.asarray(model.apply(
            {"params": params}, jnp.asarray(x)[None],
            method=model.encode_image,
        ))[0]

    # (a) square input: identical paths
    xsq = rng.normal(0, 1, (cfg.img_size, cfg.img_size, 3)).astype(np.float32)
    np.testing.assert_array_equal(enc(model_rc, xsq), enc(model_sq, xsq))

    # (b) rect input: measurable, bounded deviation
    h = cfg.img_size * 3 // 4
    img = rng.normal(0, 1, (h, cfg.img_size, 3)).astype(np.float32)
    padded = np.zeros((cfg.img_size, cfg.img_size, 3), np.float32)
    padded[:h] = img
    e_sq = enc(model_sq, padded)[: h // cfg.patch_size]
    e_rc = enc(model_rc, img)
    assert e_rc.shape == e_sq.shape
    rel = np.linalg.norm(e_rc - e_sq) / np.linalg.norm(e_sq)
    assert 0.05 < rel < 0.8, rel  # real deviation, but correlated outputs
    cos = (e_rc * e_sq).sum(-1) / (
        np.linalg.norm(e_rc, axis=-1) * np.linalg.norm(e_sq, axis=-1)
    )
    assert cos.mean() > 0.7, cos.mean()
