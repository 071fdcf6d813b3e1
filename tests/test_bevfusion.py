"""BEVFusion-lite: splat geometry oracle, segment-path parity, training."""

import numpy as np
import jax
import jax.numpy as jnp

from cm3d_tpu.train import voxelize as _voxelize
from cm3d_tpu.train.bevfusion import (
    BevFusionConfig,
    BevFusionDetector,
    FusionBatch,
    init_fusion_state,
    make_fusion_train_step,
    splat_to_bev,
)
from cm3d_tpu.train.centerpoint import CenterPointConfig
from cm3d_tpu.train.voxelize import PillarConfig

# multi-minute model-family/pipeline integration file — excluded from the
# dev tier (`-m "not slow"`); the full suite runs everything
import pytest

pytestmark = pytest.mark.slow

PILLAR = PillarConfig(x_min=-8.0, x_max=8.0, y_min=-8.0, y_max=8.0,
                      resolution=1.0, z_min=-3.0, z_max=3.0)
CFG = BevFusionConfig(
    centerpoint=CenterPointConfig(num_classes=3, trunk_channels=(8, 8)),
    cam_channels=4, cam_trunk=(4, 8), depth_bins=4, d_min=1.0, d_max=7.0,
)


def _splat_oracle(feats, depth_probs, intrinsics, cam_to_ego, pcfg, cfg):
    """Plain-python LSS splat: loop every (cam, pixel, bin)."""
    c, hf, wf, f = feats.shape
    h, w = pcfg.grid_hw
    stride = cfg.img_stride
    d = np.asarray(cfg.bin_depths())
    bev = np.zeros((h, w, f), np.float64)
    for ci in range(c):
        k = intrinsics[ci]
        e = cam_to_ego[ci]
        for vi in range(hf):
            for ui in range(wf):
                u = (ui + 0.5) * stride
                v = (vi + 0.5) * stride
                for bi in range(cfg.depth_bins):
                    x = (u - k[0, 2]) / k[0, 0] * d[bi]
                    y = (v - k[1, 2]) / k[1, 1] * d[bi]
                    p = e[:3, :3] @ np.array([x, y, d[bi]]) + e[:3, 3]
                    ix = int(np.floor((p[0] - pcfg.x_min) / pcfg.resolution))
                    iy = int(np.floor((p[1] - pcfg.y_min) / pcfg.resolution))
                    if not (0 <= ix < h and 0 <= iy < w):
                        continue
                    if not (pcfg.z_min < p[2] < pcfg.z_max):
                        continue
                    bev[ix, iy] += feats[ci, vi, ui] * depth_probs[ci, vi, ui, bi]
    return bev.astype(np.float32)


def _rand_inputs(seed=0, c=2, hf=6, wf=8):
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(c, hf, wf, CFG.cam_channels)).astype(np.float32)
    dp = rng.random((c, hf, wf, CFG.depth_bins)).astype(np.float32)
    dp /= dp.sum(-1, keepdims=True)
    ih, iw = hf * CFG.img_stride, wf * CFG.img_stride
    intr = np.tile(np.array([[12.0, 0, iw / 2], [0, 12.0, ih / 2], [0, 0, 1]],
                            np.float32), (c, 1, 1))
    # camera 0 looks +x ego (z_cam -> x_ego, x_cam -> -y_ego, y_cam -> -z_ego)
    # camera 1 looks -y ego
    e0 = np.array([[0, 0, 1, 0.5], [-1, 0, 0, 0.0], [0, -1, 0, 0.2],
                   [0, 0, 0, 1]], np.float32)
    e1 = np.array([[-1, 0, 0, 0.0], [0, 0, -1, -0.5], [0, -1, 0, 0.2],
                   [0, 0, 0, 1]], np.float32)
    return feats, dp, intr, np.stack([e0, e1])[:c]


def test_splat_matches_oracle():
    feats, dp, intr, ext = _rand_inputs()
    ref = _splat_oracle(feats, dp, intr, ext, PILLAR, CFG)
    assert np.abs(ref).sum() > 0, "oracle splatted nothing — bad fixture"
    out = np.asarray(splat_to_bev(
        jnp.asarray(feats), jnp.asarray(dp), jnp.asarray(intr),
        jnp.asarray(ext), PILLAR, CFG,
    ))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_splat_pallas_interpret_matches_scatter(monkeypatch):
    feats, dp, intr, ext = _rand_inputs(seed=1)
    args = (jnp.asarray(feats), jnp.asarray(dp), jnp.asarray(intr),
            jnp.asarray(ext), PILLAR, CFG)
    monkeypatch.setattr(_voxelize, "_USE_PALLAS_SEGMENT", False)
    scatter = np.asarray(splat_to_bev(*args))
    monkeypatch.setattr(_voxelize, "_USE_PALLAS_SEGMENT", "interpret")
    pallas = np.asarray(splat_to_bev(*args))
    np.testing.assert_allclose(pallas, scatter, rtol=1e-5, atol=1e-6)


def _fusion_batch(bsz=2, c=2, n=256, m=3, seed=0):
    rng = np.random.default_rng(seed)
    feats, dp, intr, ext = _rand_inputs(seed=seed, c=c)
    ih, iw = 6 * CFG.img_stride, 8 * CFG.img_stride
    boxes = np.zeros((bsz, m, 8), np.float32)
    boxes[..., :3] = rng.uniform(-6, 6, (bsz, m, 3))
    boxes[..., 2] = 0.5
    boxes[..., 3:6] = [1.8, 4.2, 1.6]
    boxes[..., 7] = rng.integers(0, 3, (bsz, m))
    return FusionBatch(
        points=jnp.asarray(
            rng.uniform(-7, 7, (bsz, n, 4)).astype(np.float32)),
        point_valid=jnp.ones((bsz, n), bool),
        boxes=jnp.asarray(boxes),
        box_valid=jnp.ones((bsz, m), bool),
        images=jnp.asarray(rng.random((bsz, c, ih, iw, 3), np.float32)),
        intrinsics=jnp.asarray(np.tile(intr, (bsz, 1, 1, 1))),
        cam_to_ego=jnp.asarray(np.tile(ext, (bsz, 1, 1, 1))),
    )


def test_fusion_train_step_learns_and_uses_camera():
    batch = _fusion_batch()
    ih, iw = int(batch.images.shape[2]), int(batch.images.shape[3])
    state, model, tx = init_fusion_state(
        jax.random.PRNGKey(0), PILLAR, CFG, (ih, iw), n_cams=2,
        learning_rate=3e-3,
    )
    step = jax.jit(make_fusion_train_step(model, tx, PILLAR))
    state1, m0 = step(state, batch)
    losses = [float(m0["loss"])]
    st = state1
    for _ in range(20):
        st, m = step(st, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses

    # the camera branch participates: its params moved from init
    cam0 = jax.tree.leaves(state.params["camera"])
    cam1 = jax.tree.leaves(st.params["camera"])
    moved = sum(float(np.abs(np.asarray(a) - np.asarray(b)).sum())
                for a, b in zip(cam0, cam1))
    assert moved > 0.0


def test_fusion_detector_head_shapes():
    batch = _fusion_batch(bsz=1)
    ih, iw = int(batch.images.shape[2]), int(batch.images.shape[3])
    state, model, tx = init_fusion_state(
        jax.random.PRNGKey(1), PILLAR, CFG, (ih, iw), n_cams=2)
    from cm3d_tpu.train.voxelize import pillarize

    pillars = jax.vmap(lambda p, v: pillarize(p, v, PILLAR))(
        batch.points, batch.point_valid)
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        pillars, batch.images, batch.intrinsics, batch.cam_to_ego,
    )
    h, w = PILLAR.grid_hw
    s = CFG.centerpoint.out_stride
    assert out["heatmap"].shape == (1, h // s, w // s, 3)
    assert out["yaw"].shape == (1, h // s, w // s, 2)


def test_splat_pallas_vmap_and_grad_match_scatter(monkeypatch):
    """The production TPU path vmaps AND differentiates through the splat
    (BevFusionDetector batches it; training flows params through it) —
    cover both transforms on the Pallas kernel in interpret mode against
    the scatter formulation."""
    feats, dp, intr, ext = _rand_inputs(seed=2)
    fb = jnp.asarray(np.stack([feats, feats * 0.5]))
    db = jnp.asarray(np.stack([dp, dp]))
    kb = jnp.asarray(np.stack([intr, intr]))
    eb = jnp.asarray(np.stack([ext, ext]))

    def batched(f):
        return jax.vmap(
            lambda ff, dd, kk, ee: splat_to_bev(ff, dd, kk, ee, PILLAR, CFG)
        )(f, db, kb, eb)

    def loss(f):
        return jnp.sum(batched(f) ** 2)

    monkeypatch.setattr(_voxelize, "_USE_PALLAS_SEGMENT", False)
    out_sc = np.asarray(batched(fb))
    g_sc = np.asarray(jax.grad(loss)(fb))
    monkeypatch.setattr(_voxelize, "_USE_PALLAS_SEGMENT", "interpret")
    out_pl = np.asarray(batched(fb))
    g_pl = np.asarray(jax.grad(loss)(fb))
    np.testing.assert_allclose(out_pl, out_sc, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(g_pl, g_sc, rtol=1e-5, atol=1e-6)


def test_fusion_train_step_runs_on_pallas_path(monkeypatch):
    """One full fusion train step through the interpret-mode Pallas splat
    (the real-TPU configuration): finite loss, step increments."""
    monkeypatch.setattr(_voxelize, "_USE_PALLAS_SEGMENT", "interpret")
    batch = _fusion_batch(bsz=2)
    ih, iw = int(batch.images.shape[2]), int(batch.images.shape[3])
    state, model, tx = init_fusion_state(
        jax.random.PRNGKey(0), PILLAR, CFG, (ih, iw), n_cams=2)
    step = jax.jit(make_fusion_train_step(model, tx, PILLAR))
    state1, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(np.asarray(state1.step)) == 1


def test_detector_rejects_unaligned_image_hw():
    """image_hw not divisible by the trunk stride must fail loudly (silent
    splat misprojection otherwise)."""
    import pytest

    state, model, tx = init_fusion_state(
        jax.random.PRNGKey(0), PILLAR, CFG, (48, 64), n_cams=2)
    bad = jnp.zeros((1, 2, 50, 64, 3))
    with pytest.raises(AssertionError, match="divisible"):
        model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.zeros((1,) + PILLAR.grid_hw + (PILLAR.num_features,)),
            bad, jnp.tile(jnp.eye(3), (1, 2, 1, 1)),
            jnp.tile(jnp.eye(4), (1, 2, 1, 1)),
        )


def test_apply_permutation_vjp_matches_plain_gather():
    """apply_permutation's custom VJP (ct[inv_perm], scatter-free) must
    equal the autodiff of a plain vals[perm] gather — the fusion step's
    backward depends on this bijection identity."""
    rng = np.random.default_rng(3)
    n, f = 37, 5
    vals = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    inv = jnp.argsort(perm).astype(jnp.int32)
    ct = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))

    def loss_custom(v):
        return jnp.sum(_voxelize.apply_permutation(v, perm, inv) * ct)

    def loss_plain(v):
        return jnp.sum(v[perm] * ct)

    np.testing.assert_array_equal(
        np.asarray(_voxelize.apply_permutation(vals, perm, inv)),
        np.asarray(vals[perm]))
    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_custom)(vals)),
        np.asarray(jax.grad(loss_plain)(vals)), rtol=0, atol=0)
    # jit + vmap (the production transform stack)
    vb = jnp.stack([vals, vals * 2.0])
    gb = jax.jit(jax.vmap(jax.grad(loss_custom)))(vb)
    gp = jax.vmap(jax.grad(loss_plain))(vb)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gp), rtol=0, atol=0)


def test_swin_camera_backbone_trains():
    """camera_backbone='swin_t' (the reference BEVFusion rows' actual
    image backbone): multi-scale stage outputs FPN-fuse at stride 8 into
    the same feat/depth heads; the train step must flow gradients into
    the Swin blocks (fused_attn pinned off — the Pallas window kernel has
    no AD rule)."""
    from cm3d_tpu.models.swin import SwinConfig

    tiny_swin = SwinConfig(embed_dim=8, depths=(1, 1, 1), num_heads=(1, 2, 2),
                           out_indices=(1, 2), fused_attn=False)
    cfg = BevFusionConfig(
        centerpoint=CenterPointConfig(num_classes=3, trunk_channels=(8, 8)),
        cam_channels=4, depth_bins=4, d_min=1.0, d_max=7.0,
        camera_backbone="swin_t", swin=tiny_swin,
    )
    assert cfg.img_stride == 8  # patch 4 x 2^min(out_indices)

    rng = np.random.default_rng(7)
    ih, iw = 48, 64
    bsz, c, n, m = 2, 2, 256, 3
    _, _, intr, ext = _rand_inputs(seed=7, c=c)
    intr = intr.copy()
    intr[:, 0, 2], intr[:, 1, 2] = iw / 2, ih / 2
    boxes = np.zeros((bsz, m, 8), np.float32)
    boxes[..., :3] = rng.uniform(-6, 6, (bsz, m, 3))
    boxes[..., 2] = 0.5
    boxes[..., 3:6] = [1.8, 4.2, 1.6]
    boxes[..., 7] = rng.integers(0, 3, (bsz, m))
    batch = FusionBatch(
        points=jnp.asarray(rng.uniform(-7, 7, (bsz, n, 4)).astype(np.float32)),
        point_valid=jnp.ones((bsz, n), bool),
        boxes=jnp.asarray(boxes),
        box_valid=jnp.ones((bsz, m), bool),
        images=jnp.asarray(rng.random((bsz, c, ih, iw, 3), np.float32)),
        intrinsics=jnp.asarray(np.tile(intr, (bsz, 1, 1, 1))),
        cam_to_ego=jnp.asarray(np.tile(ext, (bsz, 1, 1, 1))),
    )
    state, model, tx = init_fusion_state(
        jax.random.PRNGKey(0), PILLAR, cfg, (ih, iw), n_cams=c)
    assert "swin" in state.params["camera"]
    step = jax.jit(make_fusion_train_step(model, tx, PILLAR))
    before = np.asarray(jax.tree_util.tree_leaves(
        state.params["camera"]["swin"])[0]).copy()
    state1, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    after = np.asarray(jax.tree_util.tree_leaves(
        state1.params["camera"]["swin"])[0])
    assert np.abs(after - before).max() > 0, (
        "swin backbone params did not move — no gradient flow")


def test_camera_trunk_rejects_unknown_backbone():
    import pytest

    cfg = BevFusionConfig(camera_backbone="resnet")
    from cm3d_tpu.train.bevfusion import CameraTrunk

    with pytest.raises(ValueError, match="camera_backbone"):
        CameraTrunk(cfg).init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 48, 64, 3)))


def _tiny_swin_cfg(**kw):
    from cm3d_tpu.models.swin import SwinConfig

    return SwinConfig(embed_dim=8, depths=(1, 1, 1), num_heads=(1, 2, 2),
                      out_indices=(1, 2), fused_attn=False, **kw)


def _tiny_swin_fusion_cfg(**kw):
    return BevFusionConfig(
        centerpoint=CenterPointConfig(num_classes=3, trunk_channels=(8, 8)),
        cam_channels=4, depth_bins=4, d_min=1.0, d_max=7.0,
        camera_backbone="swin_t", swin=_tiny_swin_cfg(), **kw,
    )


def test_camera_remat_same_tree_and_grads():
    """camera_remat must not change the param tree (checkpoints
    interchange) nor the gradients (pure memory/FLOPs trade)."""
    from cm3d_tpu.train.bevfusion import CameraTrunk

    imgs = jnp.asarray(np.random.default_rng(0).random(
        (2, 48, 64, 3), np.float32))
    cfg_a = _tiny_swin_fusion_cfg()
    cfg_b = _tiny_swin_fusion_cfg(camera_remat=True)
    va = CameraTrunk(cfg_a).init(jax.random.PRNGKey(1), imgs)
    vb = CameraTrunk(cfg_b).init(jax.random.PRNGKey(1), imgs)
    assert jax.tree_util.tree_structure(va) == jax.tree_util.tree_structure(vb)

    def loss(variables, cfg):
        f, d = CameraTrunk(cfg).apply(variables, imgs)
        return jnp.sum(f ** 2) + jnp.sum(d ** 2)

    ga = jax.grad(loss)(va, cfg_a)
    gb = jax.grad(loss)(vb, cfg_b)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_camera_bf16_keeps_f32_params_and_outputs():
    """camera_bf16 changes compute dtype only: params stay f32 (optimizer
    precision), trunk outputs stay f32 (heads cast back), and both
    backbones run."""
    from cm3d_tpu.train.bevfusion import CameraTrunk

    imgs = jnp.asarray(np.random.default_rng(1).random(
        (2, 48, 64, 3), np.float32))
    for cfg in (
        BevFusionConfig(cam_channels=4, depth_bins=4, camera_bf16=True),
        _tiny_swin_fusion_cfg(camera_bf16=True),
    ):
        v = CameraTrunk(cfg).init(jax.random.PRNGKey(0), imgs)
        for leaf in jax.tree_util.tree_leaves(v["params"]):
            assert leaf.dtype == jnp.float32, leaf.dtype
        if cfg.camera_backbone == "conv":
            (f, d), _ = CameraTrunk(cfg).apply(
                v, imgs, True, mutable=["batch_stats"])
        else:
            f, d = CameraTrunk(cfg).apply(v, imgs)
        assert f.dtype == jnp.float32 and d.dtype == jnp.float32
        assert np.all(np.isfinite(np.asarray(f)))
        s = np.asarray(jnp.sum(d, axis=-1))
        np.testing.assert_allclose(s, 1.0, rtol=2e-3)


def test_camera_fused_attn_same_tree_and_grads():
    """The fused window-attention camera path differentiates via the
    custom_vjp XLA-recompute backward (models/swin.py _fused_attn_fn):
    same param tree as the unfused trainer, matching gradients.
    Interpret mode stands in for the TPU kernel on CPU; the camera_fused
    config knob itself resolves fused_attn=None (backend auto)."""
    import dataclasses as dc

    from cm3d_tpu.train.bevfusion import CameraTrunk

    cfg_a = _tiny_swin_fusion_cfg()
    # default camera_fused=True -> backend auto (Pallas on TPU, the XLA
    # path here on CPU); False is the explicit unfused A/B setting
    assert cfg_a.effective_swin().fused_attn is None
    assert dc.replace(cfg_a, camera_fused=False) \
        .effective_swin().fused_attn is False
    cfg_b = dc.replace(
        cfg_a, swin=dc.replace(cfg_a.swin, fused_attn="interpret"))

    imgs = jnp.asarray(np.random.default_rng(2).random(
        (2, 48, 64, 3), np.float32))
    va = CameraTrunk(cfg_a).init(jax.random.PRNGKey(1), imgs)
    vb = CameraTrunk(cfg_b).init(jax.random.PRNGKey(1), imgs)
    assert jax.tree_util.tree_structure(va) == jax.tree_util.tree_structure(vb)

    def loss(variables, cfg):
        f, d = CameraTrunk(cfg).apply(variables, imgs)
        return jnp.sum(f ** 2) + jnp.sum(d ** 2)

    la, ga = jax.value_and_grad(loss)(va, cfg_a)
    lb, gb = jax.value_and_grad(loss)(vb, cfg_b)
    # forwards are different implementations of the same math
    np.testing.assert_allclose(float(lb), float(la), rtol=2e-4)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(ga),
        jax.tree_util.tree_leaves_with_path(gb),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4,
            err_msg=str(kp),
        )
