"""Tensor-sharded SAM forward matches the unsharded one on the CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cm3d_tpu.models.sam import SAM_TEST, Sam
from cm3d_tpu.parallel.mesh import make_mesh
from cm3d_tpu.parallel.sharding import param_spec, shard_model_params

# multi-minute model-family/pipeline integration file — excluded from the
# dev tier (`-m "not slow"`); the full suite runs everything
pytestmark = pytest.mark.slow


def test_param_spec_rules():
    assert param_spec("image_encoder/block0/attn/qkv/kernel", 2) == P(None, "model")
    assert param_spec("image_encoder/block0/attn/proj/kernel", 2) == P("model", None)
    assert param_spec("block1/mlp/lin1/kernel", 2) == P(None, "model")
    assert param_spec("block1/mlp/lin2/kernel", 2) == P("model", None)
    assert param_spec("pos_embed", 4) == P()
    assert param_spec("neck_conv1/kernel", 4) == P()
    # a rule match whose FULL spec outranks the leaf replicates: the
    # column-parallel P(None, 'model') needs a rank-2 array even though
    # only one axis is sharded (a 2-axis spec on a 1-D leaf makes
    # device_put raise)
    assert param_spec("odd/fc1/kernel", 1) == P()
    assert param_spec("block0/attn/qkv/bias", 1) == P("model")


def test_sharded_sam_matches_unsharded():
    cfg = SAM_TEST
    model = Sam(cfg)
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((cfg.img_size, cfg.img_size, 3)).astype(np.float32))
    boxes = jnp.asarray(np.array([[4, 4, 30, 40], [8, 8, 20, 28]], np.float32))
    params = model.init(jax.random.PRNGKey(0), img, boxes)["params"]

    ref_masks, ref_iou = model.apply({"params": params}, img, boxes)

    mesh = make_mesh(n_data=4, n_model=2)
    sharded = shard_model_params(params, mesh)
    # verify something actually sharded over 'model'
    qkv = sharded["image_encoder"]["block0"]["attn"]["qkv"]["kernel"]
    assert "model" in str(qkv.sharding.spec)

    fwd = jax.jit(lambda p, i, b: model.apply({"params": p}, i, b))
    with mesh:
        masks, iou = fwd(sharded, img, boxes)
    np.testing.assert_allclose(np.asarray(masks), np.asarray(ref_masks),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(iou), np.asarray(ref_iou),
                               rtol=2e-4, atol=2e-4)


def test_camera_parallel_mask_stage_matches_single_device():
    """Camera-parallel 2D stage (SURVEY §2.4): the same fake weights run
    through generate_frame_masks on one device and with the camera ring
    sharded over a data=2 mesh must produce identical masks — the
    scan->vmap swap and GSPMD partitioning change the schedule, not the
    math."""
    from cm3d_tpu.pipelines.masks import build_fake_models, generate_frame_masks

    rng = np.random.default_rng(11)
    # 6-camera ring, 64x64 thumbnails (SAM_TEST img_size) -> scale1 path
    images = [
        (rng.random((48, 64, 3)) * 255).astype(np.uint8) for _ in range(6)
    ]

    plain = build_fake_models(seed=0)
    fm_ref = generate_frame_masks(plain, images)

    mesh = make_mesh(n_data=2, n_model=1)
    sharded = build_fake_models(seed=0, mesh=mesh)
    fm = generate_frame_masks(sharded, images)

    assert fm.labels == fm_ref.labels
    assert fm.cam_nums == fm_ref.cam_nums
    np.testing.assert_allclose(
        fm.detection_scores, fm_ref.detection_scores, rtol=1e-5, atol=1e-6
    )
    assert fm.masks.shape == fm_ref.masks.shape
    # masks are thresholded bits: demand exact agreement
    mismatch = (fm.masks != fm_ref.masks).mean()
    assert mismatch == 0.0, f"mask bit mismatch fraction {mismatch}"


def test_camera_parallel_ring_size_must_divide():
    from cm3d_tpu.pipelines.masks import build_fake_models

    rng = np.random.default_rng(1)
    images = [
        (rng.random((48, 64, 3)) * 255).astype(np.uint8) for _ in range(5)
    ]
    mesh = make_mesh(n_data=2, n_model=1)
    models = build_fake_models(seed=0, mesh=mesh)
    with pytest.raises(AssertionError, match="ring size"):
        models.prepare(images)


def test_e2e_cli_camera_mesh_flag(monkeypatch, tmp_path):
    """--camera_mesh on the fused e2e CLI must reach the model builders:
    the prepared ring upload lands sharded over the mesh data axis."""
    from cm3d_tpu.pipelines import e2e

    seen = {}

    def fake_run(frames_root, scenes, out, models, **kw):
        seen["models"] = models
        return 0

    monkeypatch.setattr(e2e, "run_e2e_waymo", fake_run)
    e2e.main(["--dataset", "waymo", "--dataroot", str(tmp_path),
              "--scenes", "s0", "--out", str(tmp_path / "o.bin"),
              "--fake_weights", "--camera_mesh", "2"])

    rng = np.random.default_rng(3)
    images = [
        (rng.random((48, 64, 3)) * 255).astype(np.uint8) for _ in range(6)
    ]
    frame = seen["models"].prepare(images)
    spec = frame["dev"].sharding.spec
    assert spec and spec[0] == "data", spec


def test_encode_chunk_matches_scan_single_device():
    """encode_chunk batches the single-chip SAM encode in groups without
    changing the math: chunk sizes 2 and 3 over a 6-camera ring produce
    bit-identical masks to the pure scan (the on-chip A/B
    scripts/ab_sam_batch.py decides if a chunk>1 ever becomes default)."""
    from cm3d_tpu.pipelines.masks import build_fake_models, generate_frame_masks

    rng = np.random.default_rng(17)
    images = [
        (rng.random((48, 64, 3)) * 255).astype(np.uint8) for _ in range(6)
    ]
    fm_ref = generate_frame_masks(build_fake_models(seed=0), images)
    for chunk in (2, 3):
        fm = generate_frame_masks(
            build_fake_models(seed=0, encode_chunk=chunk), images
        )
        assert fm.labels == fm_ref.labels
        assert (fm.masks == fm_ref.masks).all(), f"chunk={chunk}"


@pytest.mark.parametrize("n_seq", [2, 4])
def test_sequence_sharded_encode_matches_unsharded(n_seq):
    """GSPMD sequence-parallel encode (token rows sharded over the mesh,
    XLA inserting the patch-embed halo + global-attn collectives) is
    numerically identical to the single-device encode."""
    from cm3d_tpu.parallel.sharding import make_sequence_sharded_encode

    cfg = SAM_TEST
    model = Sam(cfg)
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((cfg.img_size, cfg.img_size, 3),
                                 ).astype(np.float32))
    bx = jnp.asarray(np.array([[4, 4, 30, 40]], np.float32))
    params = model.init(jax.random.PRNGKey(0), img, bx)["params"]

    ref = model.apply({"params": params}, img[None],
                      method=model.encode_image)[0]

    mesh = make_mesh(n_model=n_seq, devices=jax.devices()[:n_seq])
    encode = make_sequence_sharded_encode(mesh, model, params)
    out = encode(img)
    assert len(out.sharding.device_set) == n_seq  # actually partitioned
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
