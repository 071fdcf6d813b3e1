"""Detic converter: fabricated checkpoint -> structural match with init."""

import numpy as np
import pytest
import jax

from cm3d_tpu.models.detic import DETIC_TEST, Detic
from cm3d_tpu.models.convert_detic import convert_detic_params

# multi-minute model-family/pipeline integration file — excluded from the
# dev tier (`-m "not slow"`); the full suite runs everything
pytestmark = pytest.mark.slow


def _fake_detic_sd(cfg):
    sd = {}
    r = np.random.default_rng(0)

    def add(name, *shape):
        sd[name] = (r.standard_normal(shape) * 0.02).astype(np.float32)

    swin = cfg.swin
    p = "backbone.bottom_up."
    add(f"{p}patch_embed.proj.weight", swin.embed_dim, 3, 4, 4)
    add(f"{p}patch_embed.proj.bias", swin.embed_dim)
    add(f"{p}patch_embed.norm.weight", swin.embed_dim)
    add(f"{p}patch_embed.norm.bias", swin.embed_dim)
    for i, depth in enumerate(swin.depths):
        d = swin.stage_dim(i)
        for j in range(depth):
            b = f"{p}layers.{i}.blocks.{j}"
            for n in ("norm1", "norm2"):
                add(f"{b}.{n}.weight", d)
                add(f"{b}.{n}.bias", d)
            add(f"{b}.attn.qkv.weight", 3 * d, d)
            add(f"{b}.attn.qkv.bias", 3 * d)
            add(f"{b}.attn.proj.weight", d, d)
            add(f"{b}.attn.proj.bias", d)
            add(f"{b}.attn.relative_position_bias_table",
                (2 * swin.window_size - 1) ** 2, swin.num_heads[i])
            add(f"{b}.mlp.fc1.weight", 4 * d, d)
            add(f"{b}.mlp.fc1.bias", 4 * d)
            add(f"{b}.mlp.fc2.weight", d, 4 * d)
            add(f"{b}.mlp.fc2.bias", d)
        if i < len(swin.depths) - 1:
            add(f"{p}layers.{i}.downsample.norm.weight", 4 * d)
            add(f"{p}layers.{i}.downsample.norm.bias", 4 * d)
            add(f"{p}layers.{i}.downsample.reduction.weight", 2 * d, 4 * d)
        if i in swin.out_indices:
            add(f"{p}norm{i}.weight", d)
            add(f"{p}norm{i}.bias", d)

    n_ins = len(swin.out_indices)
    for i in range(n_ins):
        lvl = 3 + i
        din = swin.stage_dim(swin.out_indices[i])
        add(f"backbone.fpn_lateral{lvl}.weight", cfg.fpn_dim, din, 1, 1)
        add(f"backbone.fpn_lateral{lvl}.bias", cfg.fpn_dim)
        add(f"backbone.fpn_output{lvl}.weight", cfg.fpn_dim, cfg.fpn_dim, 3, 3)
        add(f"backbone.fpn_output{lvl}.bias", cfg.fpn_dim)
    for j in range(len(cfg.strides) - n_ins):
        nm = ["p6", "p7"][j]
        add(f"backbone.top_block.{nm}.weight", cfg.fpn_dim, cfg.fpn_dim, 3, 3)
        add(f"backbone.top_block.{nm}.bias", cfg.fpn_dim)

    hp = "proposal_generator.centernet_head"
    for i in range(cfg.num_head_convs):
        for tower in ("share_tower", "bbox_tower"):
            add(f"{hp}.{tower}.{3*i}.weight", cfg.fpn_dim, cfg.fpn_dim, 3, 3)
            add(f"{hp}.{tower}.{3*i}.bias", cfg.fpn_dim)
            add(f"{hp}.{tower}.{3*i+1}.weight", cfg.fpn_dim)
            add(f"{hp}.{tower}.{3*i+1}.bias", cfg.fpn_dim)
    add(f"{hp}.agn_hm.weight", 1, cfg.fpn_dim, 3, 3)
    add(f"{hp}.agn_hm.bias", 1)
    add(f"{hp}.bbox_pred.weight", 4, cfg.fpn_dim, 3, 3)
    add(f"{hp}.bbox_pred.bias", 4)
    for li in range(len(cfg.strides)):
        sd[f"{hp}.scales.{li}.scale"] = np.ones(1, np.float32)

    pooled = cfg.fpn_dim * cfg.pooler_size * cfg.pooler_size
    for k in range(cfg.num_cascade_stages):
        add(f"roi_heads.box_head.{k}.fc1.weight", cfg.fc_dim, pooled)
        add(f"roi_heads.box_head.{k}.fc1.bias", cfg.fc_dim)
        add(f"roi_heads.box_head.{k}.fc2.weight", cfg.fc_dim, cfg.fc_dim)
        add(f"roi_heads.box_head.{k}.fc2.bias", cfg.fc_dim)
        add(f"roi_heads.box_predictor.{k}.cls_score.linear.weight",
            cfg.embed_dim, cfg.fc_dim)
        add(f"roi_heads.box_predictor.{k}.cls_score.linear.bias", cfg.embed_dim)
        add(f"roi_heads.box_predictor.{k}.bbox_pred.0.weight", cfg.fc_dim, cfg.fc_dim)
        add(f"roi_heads.box_predictor.{k}.bbox_pred.0.bias", cfg.fc_dim)
        add(f"roi_heads.box_predictor.{k}.bbox_pred.2.weight", 4, cfg.fc_dim)
        add(f"roi_heads.box_predictor.{k}.bbox_pred.2.bias", 4)
    return sd


def test_fake_detic_checkpoint_converts_and_matches_init():
    import jax.numpy as jnp

    cfg = DETIC_TEST
    sd = _fake_detic_sd(cfg)
    params = convert_detic_params(sd, cfg)

    model = Detic(cfg)
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((64, 64, 3)).astype(np.float32))
    clf = rng.standard_normal((cfg.embed_dim, 3)).astype(np.float32)
    clf /= np.linalg.norm(clf, axis=0, keepdims=True)
    init = model.init(jax.random.PRNGKey(0), img, jnp.asarray(clf))["params"]

    init_shapes = jax.tree.map(lambda x: tuple(x.shape), init)
    conv_shapes = jax.tree.map(lambda x: tuple(np.asarray(x).shape), params)
    assert init_shapes == conv_shapes, (
        f"param tree mismatch:\n{set(map(str, jax.tree_util.tree_leaves_with_path(init_shapes)))
           - set(map(str, jax.tree_util.tree_leaves_with_path(conv_shapes)))}"
    )

    det = model.apply({"params": params}, img, jnp.asarray(clf))
    assert np.isfinite(np.asarray(det.boxes)).all()
