"""int8 w8a8 quantization: ops/quant.py + the SamConfig.quant_int8 path.

The quantized encode is an opt-in documented deviation from the torch
reference model (which runs fp16 CUDA, gen_2d_masks_detic.py:384-398);
these tests pin the transform/module contract and the accuracy envelope at
test scale. Production-scale timing + deviation numbers come from
scripts/ab_sam_int8.py on the real chip.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cm3d_tpu.ops.quant import (
    dynamic_int8_matmul,
    quantize_dense_params,
    quantize_weight,
)

# multi-minute model-family/pipeline integration file — excluded from the
# dev tier (`-m "not slow"`); the full suite runs everything
pytestmark = pytest.mark.slow


def test_quantize_weight_exact_on_grid():
    """Weights already on an int8 grid round-trip exactly."""
    rng = np.random.default_rng(0)
    scale = rng.uniform(0.01, 1.0, (8,)).astype(np.float32)
    q = rng.integers(-127, 128, (16, 8)).astype(np.int8)
    q[0] = 127  # pin each column's amax so the scale is recovered exactly
    w = q.astype(np.float32) * scale
    q2, s2 = quantize_weight(jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(s2), scale, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(q2), q)


def test_quantize_weight_zero_column():
    """All-zero output channels quantize without division blowups."""
    w = np.zeros((4, 3), np.float32)
    w[:, 0] = [1.0, -2.0, 0.5, 0.0]
    q, s = quantize_weight(jnp.asarray(w))
    assert np.all(np.isfinite(np.asarray(s)))
    np.testing.assert_array_equal(np.asarray(q)[:, 1:], 0)


def test_dynamic_int8_matmul_error_bound():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((32, 64)).astype(np.float32)
    w = rng.standard_normal((64, 48)).astype(np.float32)
    b = rng.standard_normal((48,)).astype(np.float32)
    q, s = quantize_weight(jnp.asarray(w))
    y = np.asarray(
        dynamic_int8_matmul(jnp.asarray(x), q, s, jnp.asarray(b), jnp.float32)
    )
    ref = x @ w + b
    rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel  # w8a8 on gaussian data: ~0.5-1% typical


def test_dynamic_int8_matmul_handles_nd_and_bf16():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, 5, 16)).astype(np.float32)
    w = rng.standard_normal((16, 8)).astype(np.float32)
    q, s = quantize_weight(jnp.asarray(w))
    y = dynamic_int8_matmul(jnp.asarray(x, jnp.bfloat16), q, s)
    assert y.shape == (2, 3, 5, 8)
    assert y.dtype == jnp.bfloat16
    rel = np.linalg.norm(np.asarray(y, np.float32) - x @ w) / np.linalg.norm(
        x @ w
    )
    assert rel < 0.05, rel


def test_quant_dense_matches_float_dense():
    """QuantDense(quantize_dense_params(tree)) ~= nn.Dense(tree)."""
    import flax.linen as nn

    from cm3d_tpu.models.common import QuantDense

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((6, 32)).astype(np.float32))
    dense = nn.Dense(24)
    params = dense.init(jax.random.PRNGKey(0), x)["params"]
    ref = dense.apply({"params": params}, x)
    qd = QuantDense(24)
    out = qd.apply({"params": quantize_dense_params(dict(params))}, x)
    rel = np.linalg.norm(np.asarray(out - ref)) / np.linalg.norm(
        np.asarray(ref)
    )
    assert rel < 0.02, rel


@pytest.fixture(scope="module")
def sam_pair():
    """(float model+params, quant model+params, image, boxes) at test scale."""
    from cm3d_tpu.models.sam import SAM_TEST, Sam, quantize_sam_params

    cfg = SAM_TEST
    model = Sam(cfg)
    img = jax.random.normal(
        jax.random.PRNGKey(1), (cfg.img_size, cfg.img_size, 3), jnp.float32
    )
    boxes = jnp.array([[4.0, 4.0, 40.0, 40.0], [10.0, 16.0, 50.0, 60.0]])
    params = model.init(jax.random.PRNGKey(0), img, boxes)["params"]
    qmodel = Sam(dataclasses.replace(cfg, quant_int8=True))
    qparams = quantize_sam_params(params)
    return model, params, qmodel, qparams, img, boxes


def test_quantize_sam_params_matches_module_tree(sam_pair):
    """The load transform produces exactly the tree the quant module
    declares (same structure, shapes, dtypes) and leaves the decoder,
    prompt encoder, patch embed, and neck float."""
    model, params, qmodel, qparams, img, boxes = sam_pair
    qinit = qmodel.init(jax.random.PRNGKey(0), img, boxes)["params"]
    assert jax.tree_util.tree_structure(qinit) == jax.tree_util.tree_structure(
        qparams
    )
    assert jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), qinit) == \
        jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), qparams)
    # untouched subtrees are the same leaves
    for key in ("mask_decoder", "prompt_encoder"):
        same = jax.tree_util.tree_all(
            jax.tree_util.tree_map(
                lambda a, b: bool(jnp.all(a == b)), params[key], qparams[key]
            )
        )
        assert same, key


def test_sam_quant_encode_close(sam_pair):
    model, params, qmodel, qparams, img, boxes = sam_pair
    ref = np.asarray(
        model.apply({"params": params}, img[None], method=model.encode_image),
        np.float32,
    )
    q = np.asarray(
        qmodel.apply(
            {"params": qparams}, img[None], method=qmodel.encode_image
        ),
        np.float32,
    )
    rel = np.linalg.norm(q - ref) / np.linalg.norm(ref)
    corr = np.corrcoef(ref.ravel(), q.ravel())[0, 1]
    assert rel < 0.1, rel
    assert corr > 0.995, corr


def test_sam_quant_decode_mask_agreement(sam_pair):
    """Thresholded masks through the (unquantized) decoder stay IoU-close
    to the float encode's masks."""
    model, params, qmodel, qparams, img, boxes = sam_pair
    m_ref, _ = model.apply({"params": params}, img, boxes)
    m_q, _ = qmodel.apply({"params": qparams}, img, boxes)
    mr = np.asarray(m_ref) > 0
    mq = np.asarray(m_q) > 0
    union = (mr | mq).sum()
    if union:
        iou = (mr & mq).sum() / union
        assert iou > 0.9, iou


def test_sam_quant_encode_under_vmap(sam_pair):
    """The camera-parallel group-scan vmaps the encode; the int8
    dot_general must batch identically to the unbatched call."""
    model, params, qmodel, qparams, img, boxes = sam_pair
    imgs = jnp.stack([img, img * 0.5])

    def enc(one):
        return qmodel.apply(
            {"params": qparams}, one[None], method=qmodel.encode_image
        )[0]

    batched = jax.vmap(enc)(imgs)
    single = jnp.stack([enc(imgs[0]), enc(imgs[1])])
    np.testing.assert_allclose(
        np.asarray(batched, np.float32),
        np.asarray(single, np.float32),
        atol=2e-5,
        rtol=1e-4,
    )


def test_quant_int8_rejects_fused_window_attn():
    from cm3d_tpu.models.sam import SAM_TEST

    with pytest.raises(ValueError):
        dataclasses.replace(
            SAM_TEST, quant_int8=True, fused_window_attn="interpret"
        )


def test_swin_quant_close_and_tree_matches():
    """Swin with int8 MLPs: the transform matches the quant module's tree
    (in BOTH fused modes — the tree must not depend on fused_attn, which
    resolves per-backend) and features stay close to float."""
    from cm3d_tpu.models.swin import (
        SWIN_TEST,
        SwinTransformer,
        quantize_swin_params,
    )

    cfg = dataclasses.replace(SWIN_TEST, fused_attn=False)
    model = SwinTransformer(cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 48, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    ref = model.apply({"params": params}, x)

    qparams = quantize_swin_params(params)
    for fused in (False, "interpret"):
        qmodel = SwinTransformer(
            dataclasses.replace(cfg, quant_int8=True, fused_attn=fused)
        )
        qinit = qmodel.init(jax.random.PRNGKey(0), x)["params"]
        assert jax.tree_util.tree_map(
            lambda a: (a.shape, str(a.dtype)), qinit
        ) == jax.tree_util.tree_map(
            lambda a: (a.shape, str(a.dtype)), qparams
        ), fused
    qmodel = SwinTransformer(dataclasses.replace(cfg, quant_int8=True))
    out = qmodel.apply({"params": qparams}, x)
    for k in ref:
        r = np.asarray(ref[k], np.float32)
        q = np.asarray(out[k], np.float32)
        rel = np.linalg.norm(q - r) / max(1e-12, np.linalg.norm(r))
        assert rel < 0.1, (k, rel)


def test_detic_quant_detections_close():
    """Detic with int8 Swin MLPs keeps its detections near the float run
    (same valid set, small box/score drift) at test scale."""
    from cm3d_tpu.models.detic import (
        DETIC_TEST,
        Detic,
        quantize_detic_params,
    )

    rng = np.random.default_rng(5)
    model = Detic(DETIC_TEST)
    clf = jnp.asarray(
        rng.standard_normal(
            (DETIC_TEST.embed_dim, 6)
        ).astype(np.float32)
    )
    img = jnp.asarray(rng.standard_normal((64, 96, 3)).astype(np.float32))
    hw = jnp.asarray([64, 96], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), img, clf)["params"]
    ref = model.apply({"params": params}, img, clf, hw)

    qmodel = Detic(
        dataclasses.replace(
            DETIC_TEST,
            swin=dataclasses.replace(DETIC_TEST.swin, quant_int8=True),
        )
    )
    out = qmodel.apply(
        {"params": quantize_detic_params(params)}, img, clf, hw
    )
    s_ref = np.asarray(ref.scores, np.float32)
    s_q = np.asarray(out.scores, np.float32)
    v_ref = np.asarray(ref.valid)
    v_q = np.asarray(out.valid)
    # same number of surviving detections, scores drift < 5% of the spread
    assert (v_ref > 0).sum() == (v_q > 0).sum()
    both = (v_ref > 0) & (v_q > 0)
    if both.any():
        spread = max(1e-6, s_ref[both].max() - s_ref[both].min(), 0.05)
        assert np.abs(s_ref[both] - s_q[both]).max() < 0.05 + 0.1 * spread


def test_fake_models_quant_pipeline_smoke():
    """build_fake_models(quant_int8=True) drives encode+decode end-to-end
    through the batched pipeline wrappers."""
    from cm3d_tpu.pipelines.masks import build_fake_models

    models = build_fake_models(quant_int8=True)
    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 255, (64, 64, 3), np.uint8) for _ in range(2)]
    frame = models.prepare(imgs)
    emb = models.sam_encode(frame)
    assert np.all(np.isfinite(np.asarray(emb, np.float32)))


def test_reconcile_quantization_semantics(sam_pair):
    """Float + want -> transformed; quantized + want -> passthrough (no
    double-quantize); quantized + not want -> loud error."""
    from cm3d_tpu.models.sam import quantize_sam_params
    from cm3d_tpu.ops.quant import is_quantized_tree, reconcile_quantization

    model, params, qmodel, qparams, img, boxes = sam_pair
    assert not is_quantized_tree(params)
    assert is_quantized_tree(qparams)

    out = reconcile_quantization(params, quantize_sam_params, True, "SAM")
    assert is_quantized_tree(out)
    same = reconcile_quantization(qparams, quantize_sam_params, True, "SAM")
    assert same is qparams  # passthrough, not re-transformed
    back = reconcile_quantization(params, quantize_sam_params, False, "SAM")
    assert back is params
    with pytest.raises(ValueError, match="int8-quantized"):
        reconcile_quantization(qparams, quantize_sam_params, False, "SAM")


def test_quantized_tree_orbax_roundtrip(sam_pair, tmp_path):
    """Pre-quantized deployment checkpoints (convert_checkpoints.py
    --quant_int8): orbax must round-trip the int8 leaves bit-exactly and
    the restored tree must drive the quant model."""
    from cm3d_tpu.models.checkpoints import load_params, save_params

    model, params, qmodel, qparams, img, boxes = sam_pair
    path = str(tmp_path / "sam_test_int8")
    save_params(qparams, path)
    restored = load_params(path)
    kq = restored["image_encoder"]["block0"]["attn"]["qkv"]["kernel_q"]
    assert np.asarray(kq).dtype == np.int8
    ref = qmodel.apply(
        {"params": qparams}, img[None], method=qmodel.encode_image
    )
    out = qmodel.apply(
        {"params": restored}, img[None], method=qmodel.encode_image
    )
    np.testing.assert_array_equal(
        np.asarray(out, np.float32), np.asarray(ref, np.float32)
    )


def test_gdino_quant_detector_close():
    """--detector gdino --quant_int8: the GroundingDINO Swin backbone's
    MLPs quantize through the same boundary as Detic's; detections from
    the swapped-in detector stay close to the float run."""
    from cm3d_tpu.pipelines.masks import attach_gdino, build_fake_models

    rng = np.random.default_rng(9)
    imgs = [rng.integers(0, 255, (64, 64, 3), np.uint8) for _ in range(2)]

    def detect(quant):
        # detic_used=False mirrors the CLI: the Detic about to be swapped
        # out is neither quantized nor validated against the flag
        models = attach_gdino(
            build_fake_models(seed=0, quant_int8=quant, detic_used=False),
            test=True, quant_int8=quant, box_threshold=0.0,
        )
        frame = models.prepare(imgs)
        return models.detic(frame)

    b_f, s_f, c_f, v_f = (np.asarray(x, np.float32) for x in detect(False))
    b_q, s_q, c_q, v_q = (np.asarray(x, np.float32) for x in detect(True))
    assert v_f.shape == v_q.shape
    assert (v_f > 0).sum() == (v_q > 0).sum() > 0
    # the detector's score-ordered top-k REORDERS under tiny random-weight
    # score perturbations, so match by nearest box instead of by slot. At
    # this test scale (embed 8, random weights) the box-regression head
    # chaotically amplifies the ~1% backbone perturbation for a FEW
    # queries, so the box assertion is majority-based; feature-level
    # closeness of the quantized Swin itself is pinned separately by
    # test_swin_quant_close_and_tree_matches.
    for cam in range(v_f.shape[0]):
        fi = np.where(v_f[cam] > 0)[0]
        qi = np.where(v_q[cam] > 0)[0]
        if len(fi) == 0:
            continue
        d = np.abs(b_f[cam, fi][:, None] - b_q[cam, qi][None]).max(-1)
        j = d.argmin(1)
        near = d[np.arange(len(fi)), j]
        ok = near < 2.0
        assert ok.mean() > 0.66, (cam, near)
        # score closeness on the coherently-matched pairs (the chaotic
        # ones matched a DIFFERENT query's box, so their scores are
        # unrelated by construction)
        np.testing.assert_allclose(
            s_q[cam, qi[j[ok]]], s_f[cam, fi[ok]], atol=0.05
        )


def test_quant_camera_parallel_matches_single_device():
    """quant_int8 composes with the camera-parallel mask stage: the
    group-scan over a data=2 mesh is bit-identical to the single-device
    scan (the int8 dot is exact integer math; dequant order is
    schedule-independent)."""
    from cm3d_tpu.parallel import make_mesh
    from cm3d_tpu.pipelines.masks import (
        build_fake_models,
        generate_frame_masks,
    )

    rng = np.random.default_rng(11)
    images = [
        (rng.random((48, 64, 3)) * 255).astype(np.uint8) for _ in range(6)
    ]
    fm_ref = generate_frame_masks(
        build_fake_models(seed=0, quant_int8=True), images
    )
    mesh = make_mesh(n_data=2, n_model=1)
    fm = generate_frame_masks(
        build_fake_models(seed=0, quant_int8=True, mesh=mesh), images
    )
    assert fm.labels == fm_ref.labels
    np.testing.assert_allclose(
        fm.detection_scores, fm_ref.detection_scores, rtol=1e-5, atol=1e-6
    )
    assert (fm.masks == fm_ref.masks).all()


def test_quant_tensor_sharded_matches_unsharded(sam_pair):
    """Megatron-style tensor sharding composes with quant_int8: kernel_q
    shards like kernel (column/row-parallel) and the per-out-channel
    kernel_scale follows the out axis; the sharded forward matches the
    unsharded quant forward."""
    from jax.sharding import PartitionSpec as P

    from cm3d_tpu.parallel import make_mesh
    from cm3d_tpu.parallel.sharding import param_spec, shard_model_params

    assert param_spec("block0/attn/qkv/kernel_q", 2) == P(None, "model")
    assert param_spec("block0/attn/qkv/kernel_scale", 1) == P("model")
    assert param_spec("block0/attn/proj/kernel_q", 2) == P("model", None)
    assert param_spec("block0/attn/proj/kernel_scale", 1) == P()
    assert param_spec("block0/mlp/lin1/kernel_q", 2) == P(None, "model")
    assert param_spec("block0/mlp/lin2/kernel_q", 2) == P("model", None)

    model, params, qmodel, qparams, img, boxes = sam_pair
    ref_masks, ref_iou = qmodel.apply({"params": qparams}, img, boxes)

    mesh = make_mesh(n_data=4, n_model=2)
    sharded = shard_model_params(qparams, mesh)
    kq = sharded["image_encoder"]["block0"]["attn"]["qkv"]["kernel_q"]
    assert "model" in str(kq.sharding.spec)

    fwd = jax.jit(lambda p, i, b: qmodel.apply({"params": p}, i, b))
    with mesh:
        masks, iou = fwd(sharded, img, boxes)
    np.testing.assert_allclose(
        np.asarray(masks, np.float32), np.asarray(ref_masks, np.float32),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(iou, np.float32), np.asarray(ref_iou, np.float32),
        rtol=2e-4, atol=2e-4,
    )


def test_quant_sequence_sharded_encode_matches(sam_pair):
    """quant_int8 composes with GSPMD sequence parallelism: token rows
    shard over the mesh while the per-token activation scales reduce over
    the (unsharded) feature axis."""
    import jax as _jax

    from cm3d_tpu.parallel import make_mesh
    from cm3d_tpu.parallel.sharding import make_sequence_sharded_encode

    model, params, qmodel, qparams, img, boxes = sam_pair
    ref = qmodel.apply(
        {"params": qparams}, img[None], method=qmodel.encode_image
    )[0]
    mesh = make_mesh(n_model=2, devices=_jax.devices()[:2])
    encode = make_sequence_sharded_encode(mesh, qmodel, qparams)
    out = encode(img)
    assert len(out.sharding.device_set) == 2
    np.testing.assert_allclose(
        np.asarray(out, np.float32),
        np.asarray(ref, np.float32),
        rtol=2e-4,
        atol=2e-4,
    )


# ---- static (calibrated) activation scales -----------------------------


def test_static_int8_matmul_matches_dynamic_in_envelope():
    """With act_scale set to the batch's true amax/127, the static path
    is as accurate as the dynamic path (same float reference, similar
    error); out-of-envelope activations clip instead of overflowing."""
    from cm3d_tpu.ops.quant import (
        dynamic_int8_matmul,
        quantize_weight,
        static_int8_matmul,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(32, 24)).astype(np.float32))
    w_q, w_s = quantize_weight(w)
    ref = np.asarray(x @ w)
    act_scale = jnp.max(jnp.abs(x)) / 127.0

    stat = np.asarray(static_int8_matmul(x, w_q, w_s, act_scale))
    dyn = np.asarray(dynamic_int8_matmul(x, w_q, w_s))
    err_s = np.linalg.norm(stat - ref) / np.linalg.norm(ref)
    err_d = np.linalg.norm(dyn - ref) / np.linalg.norm(ref)
    assert err_s < 0.05, err_s
    # per-tensor static cannot beat per-token dynamic, but must be the
    # same order of accuracy on in-envelope data
    assert err_s < 4 * err_d + 1e-3, (err_s, err_d)

    # 100x out-of-envelope rows clip to the envelope (finite output)
    x_big = x.at[0].mul(100.0)
    out = np.asarray(static_int8_matmul(x_big, w_q, w_s, act_scale))
    assert np.isfinite(out).all()
    assert np.abs(out[0]).max() <= np.abs(ref).max() * 40  # clipped, not 100x


def test_bake_act_scales_from_sow():
    """QuantDense sows its input absmax under mutable intermediates; the
    bake writes matching act_scale leaves the static module consumes."""
    from cm3d_tpu.models.common import QuantDense
    from cm3d_tpu.ops.quant import bake_act_scales, quantize_dense_params

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 12)).astype(np.float32))
    float_params = {
        "kernel": rng.normal(size=(12, 6)).astype(np.float32),
        "bias": rng.normal(size=(6,)).astype(np.float32),
    }
    qp = quantize_dense_params(float_params)

    dyn = QuantDense(6)
    y_dyn, state = dyn.apply(
        {"params": qp}, x, mutable=["intermediates"]
    )
    baked = bake_act_scales({"qd": qp}, {"qd": state["intermediates"]})
    assert "act_scale" in baked["qd"]
    np.testing.assert_allclose(
        baked["qd"]["act_scale"], float(jnp.max(jnp.abs(x))) / 127.0,
        rtol=1e-6,
    )
    # original tree untouched
    assert "act_scale" not in qp

    stat = QuantDense(6, static_scale=True)
    y_stat = stat.apply({"params": baked["qd"]}, x)
    rel = np.linalg.norm(np.asarray(y_stat) - np.asarray(y_dyn)) / max(
        np.linalg.norm(np.asarray(y_dyn)), 1e-9
    )
    assert rel < 0.05, rel


def test_sam_static_calibrated_encode_close(sam_pair):
    """SAM encoder with quant_static: calibrate on one batch, encode a
    NEARBY batch — output stays close to both the dynamic-int8 and the
    float encodes (the deploy-mode accuracy contract)."""
    from cm3d_tpu.models.sam import Sam, calibrate_sam_act_scales

    model, params, qmodel, qparams, img, boxes = sam_pair
    cfg_static = dataclasses.replace(qmodel.cfg, quant_static=True)
    calibrated = calibrate_sam_act_scales(cfg_static, qparams, img[None])
    smodel = Sam(cfg_static)

    # a nearby (same-distribution) input, NOT the calibration image
    img2 = img + 0.05 * jax.random.normal(
        jax.random.PRNGKey(7), img.shape, jnp.float32
    )
    ref = np.asarray(
        model.apply({"params": params}, img2[None],
                    method=model.encode_image), np.float32)
    dyn = np.asarray(
        qmodel.apply({"params": qparams}, img2[None],
                     method=qmodel.encode_image), np.float32)
    stat = np.asarray(
        smodel.apply({"params": calibrated}, img2[None],
                     method=smodel.encode_image), np.float32)

    rel_sf = np.linalg.norm(stat - ref) / np.linalg.norm(ref)
    rel_sd = np.linalg.norm(stat - dyn) / np.linalg.norm(dyn)
    corr = np.corrcoef(ref.ravel(), stat.ravel())[0, 1]
    assert rel_sf < 0.15, rel_sf
    assert rel_sd < 0.1, rel_sd
    assert corr > 0.99, corr


def test_quant_static_requires_int8():
    from cm3d_tpu.models.sam import SAM_TEST

    with pytest.raises(ValueError, match="quant_static requires"):
        dataclasses.replace(SAM_TEST, quant_static=True)
    cfg = dataclasses.replace(SAM_TEST, quant_int8=True, quant_static=True)
    assert cfg.quant_mode() == "static"


def test_fake_models_quant_static_lazy_calibration():
    """build_fake_models(quant_int8 + quant_static): the FIRST ring
    calibrates (bakes act_scale into the served params), later rings run
    the static path; embeddings stay close to the dynamic pipeline's."""
    from cm3d_tpu.pipelines.masks import build_fake_models

    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 255, (64, 64, 3), np.uint8) for _ in range(2)]
    imgs2 = [rng.integers(0, 255, (64, 64, 3), np.uint8) for _ in range(2)]

    dyn = build_fake_models(quant_int8=True)
    stat = build_fake_models(quant_int8=True, quant_static=True)

    e_first = np.asarray(stat.sam_encode(stat.prepare(imgs)), np.float32)
    # second, DIFFERENT ring: static path with first-ring scales
    e_stat = np.asarray(stat.sam_encode(stat.prepare(imgs2)), np.float32)
    e_dyn = np.asarray(dyn.sam_encode(dyn.prepare(imgs2)), np.float32)

    assert np.isfinite(e_first).all() and np.isfinite(e_stat).all()
    rel = np.linalg.norm(e_stat - e_dyn) / np.linalg.norm(e_dyn)
    corr = np.corrcoef(e_dyn.ravel(), e_stat.ravel())[0, 1]
    assert rel < 0.1, rel
    assert corr > 0.99, corr
