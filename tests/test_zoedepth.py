"""ZoeDepth (metric monocular depth): BEiT block parity against torch,
align-corners resize / transposed-conv converter parity, converter tree
conformance, and metric-bins head semantics.

Reference contract: src/nuscenes/gen_2d_masks_detic.py:117-124 (ZoeD hub
load + predict_depth) and the use_zoedepth branch :408-451.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from cm3d_tpu.models.zoedepth import (
    ZOE_TEST,
    BeitBlock,
    ZoeDepthModel,
    _beit_rel_pos_index,
    convert_zoedepth_params,
    make_predict_depth,
    resize_bilinear_ac,
    synth_zoedepth_state_dict,
)

# multi-minute model-family/pipeline integration file — excluded from the
# dev tier (`-m "not slow"`); the full suite runs everything
pytestmark = pytest.mark.slow

RNG = np.random.default_rng(7)


def test_resize_bilinear_ac_matches_torch():
    x = RNG.standard_normal((2, 7, 9, 3)).astype(np.float32)
    for out_hw in [(13, 20), (3, 4), (14, 18), (7, 9)]:
        ours = np.asarray(resize_bilinear_ac(jnp.asarray(x), out_hw))
        ref = (
            torch.nn.functional.interpolate(
                torch.tensor(x).permute(0, 3, 1, 2), size=out_hw,
                mode="bilinear", align_corners=True,
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("k,s", [(4, 4), (2, 2)])
def test_convtranspose_conversion_matches_torch(k, s):
    import flax.linen as nn

    from cm3d_tpu.models.zoedepth import _convT

    tconv = torch.nn.ConvTranspose2d(5, 6, k, stride=s)
    sd = {
        "up.weight": tconv.weight.detach().numpy(),
        "up.bias": tconv.bias.detach().numpy(),
    }
    x = RNG.standard_normal((1, 3, 4, 5)).astype(np.float32)
    ref = (
        tconv(torch.tensor(x).permute(0, 3, 1, 2))
        .permute(0, 2, 3, 1)
        .detach()
        .numpy()
    )
    got = nn.ConvTranspose(6, (k, k), strides=(s, s)).apply(
        {"params": jax.tree.map(jnp.asarray, _convT(sd, "up"))},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def _hf_beit_layer(dim, heads, grid):
    from transformers.models.beit.modeling_beit import BeitLayer
    from transformers import BeitConfig as HFBeitConfig

    cfg = HFBeitConfig(
        hidden_size=dim,
        num_attention_heads=heads,
        intermediate_size=dim * 4,
        image_size=grid * 16,
        patch_size=16,
        use_relative_position_bias=True,
        use_absolute_position_embeddings=False,
        layer_scale_init_value=0.1,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    # constructing the bare layer skips PreTrainedModel's dispatch setup
    cfg._attn_implementation = "eager"
    try:
        layer = BeitLayer(cfg, window_size=(grid, grid), drop_path_rate=0.0)
    except TypeError:
        layer = BeitLayer(cfg, window_size=(grid, grid))
    layer.eval()
    return layer


def _convert_hf_beit_layer(layer):
    sd = {k: v.detach().numpy() for k, v in layer.state_dict().items()}
    att = "attention.attention"
    q = sd[f"{att}.query.weight"]
    k = sd[f"{att}.key.weight"]
    v = sd[f"{att}.value.weight"]
    return {
        "gamma_1": sd["lambda_1"],
        "gamma_2": sd["lambda_2"],
        "norm1": {"scale": sd["layernorm_before.weight"],
                  "bias": sd["layernorm_before.bias"]},
        "norm2": {"scale": sd["layernorm_after.weight"],
                  "bias": sd["layernorm_after.bias"]},
        "attn": {
            "qkv_kernel": np.concatenate([q, k, v], 0).T,
            "q_bias": sd[f"{att}.query.bias"],
            "v_bias": sd[f"{att}.value.bias"],
            "relative_position_bias_table": sd[
                f"{att}.relative_position_bias.relative_position_bias_table"
            ],
            "proj": {"kernel": sd["attention.output.dense.weight"].T,
                     "bias": sd["attention.output.dense.bias"]},
        },
        "mlp": {
            "lin1": {"kernel": sd["intermediate.dense.weight"].T,
                     "bias": sd["intermediate.dense.bias"]},
            "lin2": {"kernel": sd["output.dense.weight"].T,
                     "bias": sd["output.dense.bias"]},
        },
    }


def test_beit_block_matches_transformers():
    dim, heads, grid = 32, 2, 4
    layer = _hf_beit_layer(dim, heads, grid)
    params = _convert_hf_beit_layer(layer)
    x = RNG.standard_normal((1, grid * grid + 1, dim)).astype(np.float32)
    with torch.no_grad():
        ref = layer(
            torch.tensor(x), resolution=(grid * 16, grid * 16)
        )[0].numpy()
    got = BeitBlock(dim, heads, 4.0, (grid, grid)).apply(
        {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


def test_rel_pos_index_matches_transformers():
    grid = 4
    layer = _hf_beit_layer(32, 2, grid)
    bias_mod = layer.attention.attention.relative_position_bias
    hf_index = bias_mod.generate_relative_position_index(
        (grid, grid)
    ).numpy()
    np.testing.assert_array_equal(_beit_rel_pos_index(grid, grid), hf_index)


def test_converter_coverage_and_forward():
    from cm3d_tpu.models.verify_convert import key_coverage, tree_conformance

    cfg = ZOE_TEST
    sd = synth_zoedepth_state_dict(cfg, RNG)
    params, cov = key_coverage(sd, lambda s: convert_zoedepth_params(s, cfg))
    # only refinenet4's dead resConfUnit1 may be ignored
    assert all("refinenet4.resConfUnit1" in k for k in cov["ignored"])
    model = ZoeDepthModel(cfg)
    h, w = cfg.img_hw
    x0 = jnp.zeros((1, h, w, 3), jnp.float32)
    init = jax.eval_shape(
        lambda r: model.init(r, x0), jax.random.PRNGKey(0)
    )["params"]
    rep = tree_conformance(params, init)
    assert not rep["missing"] and not rep["extra"] and not rep["mismatched"]

    x = jnp.asarray(RNG.standard_normal((2, h, w, 3)).astype(np.float32))
    depth, rel = model.apply({"params": params}, x)
    assert depth.shape == (2, h, w) and rel.shape == (2, h, w)
    d = np.asarray(depth)
    assert np.isfinite(d).all()
    assert (d >= cfg.min_depth - 1e-6).all()
    assert (d <= cfg.max_depth + 1e-6).all()


def test_ckpt_grid_interpolation():
    """A square-trained checkpoint table is resized to the config grid."""
    cfg = ZOE_TEST
    sd = synth_zoedepth_state_dict(cfg, RNG, ckpt_grid=(4, 4))
    params = convert_zoedepth_params(sd, cfg)
    gh, gw = cfg.grid_hw
    num_rel = (2 * gh - 1) * (2 * gw - 1) + 3
    t = params["core"]["beit"]["block0"]["attn"][
        "relative_position_bias_table"
    ]
    assert t.shape == (num_rel, cfg.num_heads)


def test_inv_attractor_semantics():
    """The metric-bins refinement pulls bin centers toward attractors with
    the inverse attractor dx/(1+alpha*dx^gamma), mean over attractors."""
    alpha, gamma = 1000.0, 2.0
    a = np.array([2.0, 4.0], np.float32)  # attractor positions
    b = np.array([1.0, 3.0, 5.0], np.float32)  # bin centers
    dx = a[:, None] - b[None, :]
    delta = (dx / (1 + alpha * np.abs(dx) ** gamma)).mean(0)
    b_new = b + delta
    # each bin moves toward the nearest attractor, by a bounded step
    assert b_new[0] > b[0] and b_new[2] < b[2]
    assert np.abs(b_new - b).max() < 0.1


def test_predict_depth_contract():
    """predict_depth returns metric depth at the INPUT resolution
    (reference predict_depth wraps infer_pil, :121-124)."""
    cfg = ZOE_TEST
    model = ZoeDepthModel(cfg)
    sd = synth_zoedepth_state_dict(cfg, RNG)
    params = jax.tree.map(jnp.asarray, convert_zoedepth_params(sd, cfg))
    predict = make_predict_depth(model, params, flip_aug=True)
    img = RNG.integers(0, 255, (50, 70, 3)).astype(np.uint8)
    d = predict(img)
    assert d.shape == (50, 70) and d.dtype == np.float32
    assert np.isfinite(d).all() and (d > 0).all()


def test_use_zoedepth_flips_artifact_payload(tmp_path):
    """Behavior-flipping seam test: with use_zoedepth on, the mask stage
    stores per-mask masked metric depth in place of RLE masks (reference
    gen_2d_masks_detic.py:408-451,484-486)."""
    from cm3d_tpu.config import MaskStageConfig
    from cm3d_tpu.datasets.artifacts import MaskArtifactStore
    from cm3d_tpu.pipelines.masks import (
        attach_zoedepth, build_fake_models, run_mask_stage,
    )

    models = attach_zoedepth(build_fake_models(seed=0), test=True)
    assert models.predict_depth is not None
    images = [(RNG.random((48, 64, 3)) * 255).astype(np.uint8)]

    run_mask_stage(
        models, lambda s, f: images, ["sc-z"], lambda s: 1,
        str(tmp_path), MaskStageConfig(use_zoedepth=True), verbose=False,
    )
    store = MaskArtifactStore(tmp_path)
    out = store.read_frame_depths("sc-z", 0)
    assert out is not None
    data, depths = out
    assert isinstance(depths, np.ndarray) and depths.dtype == np.float32
    m = len(data["labels"])
    assert depths.shape == (m, 48, 64)
    if m:
        # depth is masked: strictly positive somewhere inside the mask,
        # zero outside every mask's support
        assert (depths >= 0).all()
        assert depths.max() > 0

    # and with the flag off (same models), the payload is RLE masks again
    run_mask_stage(
        models, lambda s, f: images, ["sc-r"], lambda s: 1,
        str(tmp_path), MaskStageConfig(use_zoedepth=False), verbose=False,
    )
    fm = store.read_frame("sc-r", 0)
    assert fm is not None and fm.masks.dtype == np.uint8


def test_masked_depth_images_crops_to_mask():
    """masked_depth_images zeroes depth outside each mask and keeps the
    camera's own depth inside it."""
    from cm3d_tpu.ops.bitmask import pack_masks_np
    from cm3d_tpu.pipelines.masks import masked_depth_images

    w, h = 8, 6
    dense = np.zeros((2, w, h), np.uint8)
    dense[0, 1:3, 2:5] = 1  # mask 0 on camera 0
    dense[1, 4:7, 0:2] = 1  # mask 1 on camera 1
    d0 = np.full((h, w), 3.0, np.float32)
    d1 = np.full((h, w), 7.0, np.float32)
    handle = {
        "planes": pack_masks_np(dense),
        "layout": "xy",
        "plane_wh": (w, h),
        "total": 2,
        "labels": ["car", "truck"],
        "cams": [0, 1],
        "depths": [d0, d1],
    }
    md = masked_depth_images(handle)
    assert md.shape == (2, h, w)
    assert np.array_equal(md[0] != 0, dense[0].T.astype(bool))
    assert np.all(md[0][dense[0].T.astype(bool)] == 3.0)
    assert np.all(md[1][dense[1].T.astype(bool)] == 7.0)


def test_use_zoedepth_empty_frame_still_writes_depth_payload(tmp_path):
    """A zero-detection frame in zoe mode must write the DEPTH payload
    type ([0, H, W] float32), not an RLE-mode empty list — mixed payload
    types within a scene break read_frame_depths consumers."""
    import dataclasses

    from cm3d_tpu.config import MaskStageConfig
    from cm3d_tpu.datasets.artifacts import MaskArtifactStore
    from cm3d_tpu.pipelines.masks import (
        attach_zoedepth, build_fake_models, run_mask_stage,
    )

    def no_detic(frame):
        c, d = 1, 8
        return (np.zeros((c, d, 4), np.float32), np.zeros((c, d), np.float32),
                np.zeros((c, d), np.int64), np.zeros((c, d), bool))

    models = dataclasses.replace(
        attach_zoedepth(build_fake_models(seed=0), test=True), detic=no_detic
    )
    images = [(RNG.random((48, 64, 3)) * 255).astype(np.uint8)]
    run_mask_stage(
        models, lambda s, f: images, ["sc-e"], lambda s: 1,
        str(tmp_path), MaskStageConfig(use_zoedepth=True), verbose=False,
    )
    out = MaskArtifactStore(tmp_path).read_frame_depths("sc-e", 0)
    assert out is not None
    data, depths = out
    assert isinstance(depths, np.ndarray) and depths.dtype == np.float32
    assert depths.shape[0] == 0 and len(data["labels"]) == 0
