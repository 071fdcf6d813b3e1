"""Hermetic mask-generation stage: fake models -> reference-layout artifacts."""

import numpy as np
import pytest

from cm3d_tpu.config import MaskStageConfig
from cm3d_tpu.datasets.artifacts import MaskArtifactStore
from cm3d_tpu.pipelines.masks import (
    _logits_to_masks,
    build_fake_models,
    classwise_nms_np,
    generate_frame_masks,
    run_mask_stage,
)

RNG = np.random.default_rng(37)


def test_classwise_nms_semantics():
    boxes = [[0, 0, 10, 10], [1, 1, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]]
    scores = [0.9, 0.8, 0.95, 0.5]
    labels = ["car", "car", "truck", "car"]
    kept = classwise_nms_np(boxes, scores, labels, 0.5)
    # car: box0 suppresses box1; truck independent; far car kept
    assert set(kept) == {0, 2, 3}


def test_logits_to_masks_upsample_crop():
    logits = np.full((1, 8, 8), -5.0, np.float32)
    logits[0, 2:4, 2:4] = 5.0
    masks = _logits_to_masks(logits, (32, 16))  # h=32 -> side 32, crop w=16
    assert masks.shape == (1, 32, 16)
    assert masks[0, 10:14, 10:14].all()  # block interior maps to ~8..16
    assert not masks[0, :6].any() and not masks[0, 18:].any()
    assert masks.sum() < 32 * 16  # not everything positive


@pytest.fixture(scope="module")
def fake_models():
    return build_fake_models(seed=0)


def test_generate_frame_masks_contract(fake_models):
    images = [
        (RNG.random((48, 64, 3)) * 255).astype(np.uint8) for _ in range(2)
    ]
    fm = generate_frame_masks(fake_models, images, MaskStageConfig())
    n = len(fm.labels)
    assert len(fm.detection_scores) == n and len(fm.cam_nums) == n
    assert fm.masks.shape[0] == n
    if n:
        # masks stored [W, H]
        assert fm.masks.shape[1:] == (64, 48)
        assert set(fm.cam_nums) <= {0, 1}
        from cm3d_tpu.config import NUSCENES_CLASSES
        assert set(fm.labels) <= set(NUSCENES_CLASSES)


def test_run_mask_stage_and_resume(tmp_path, fake_models):
    images = {(s, f): [(RNG.random((48, 64, 3)) * 255).astype(np.uint8)]
              for s in ["sc-a", "sc-b"] for f in range(2)}
    calls = []

    def provider(scene, frame):
        calls.append((scene, frame))
        return images[(scene, frame)]

    run_mask_stage(
        fake_models, provider, ["sc-a", "sc-b"], lambda s: 2,
        str(tmp_path), verbose=False,
    )
    store = MaskArtifactStore(tmp_path)
    assert store.completed_scenes() == {"sc-a", "sc-b"}
    assert len(calls) == 4

    # resume: nothing re-processed
    calls.clear()
    run_mask_stage(
        fake_models, provider, ["sc-a", "sc-b"], lambda s: 2,
        str(tmp_path), verbose=False,
    )
    assert calls == []

    # artifacts readable and consistent
    fm = store.read_frame("sc-a", 0)
    assert fm is not None
    assert len(fm.labels) == fm.masks.shape[0]


def test_run_mask_stage_mid_scene_kill_and_restart(tmp_path, fake_models):
    """Kill-and-restart parity (SURVEY §5 failure row): a run that died
    after frame 0 of a scene — artifacts written, no manifest entry —
    resumes by generating only the missing frame, and the final artifacts
    equal a never-interrupted run's."""
    images = {(s, f): [(RNG.random((48, 64, 3)) * 255).astype(np.uint8)]
              for s in ["sc-kill"] for f in range(3)}

    def provider(scene, frame):
        calls.append((scene, frame))
        return images[(scene, frame)]

    # clean reference run
    calls = []
    clean = tmp_path / "clean"
    run_mask_stage(fake_models, provider, ["sc-kill"], lambda s: 3,
                   str(clean), verbose=False)

    # interrupted run: frame 0 written, manifest never marked
    killed = tmp_path / "killed"
    store = MaskArtifactStore(killed)
    fm0 = store.read_frame("sc-kill", 0)
    assert fm0 is None
    frame0 = MaskArtifactStore(clean).read_frame("sc-kill", 0)
    store.write_frame("sc-kill", 0, frame0)
    assert store.completed_scenes() == set()

    calls = []
    run_mask_stage(fake_models, provider, ["sc-kill"], lambda s: 3,
                   str(killed), verbose=False)
    assert sorted(calls) == [("sc-kill", 1), ("sc-kill", 2)]  # frame 0 skipped
    assert store.completed_scenes() == {"sc-kill"}

    for f in range(3):
        a = MaskArtifactStore(clean).read_frame("sc-kill", f)
        b = store.read_frame("sc-kill", f)
        assert a.labels == b.labels
        np.testing.assert_array_equal(a.masks, b.masks)


def _stub_models(n_det: int, n_cams: int = 1):
    """Deterministic stub MaskModels: n_det well-separated detections per
    camera, trivial planes — lets cap-truncation tests count exactly."""
    from cm3d_tpu.pipelines.masks import MaskModels
    from cm3d_tpu.vocab import CUSTOM_VOCABULARY_NUSCENES

    def prepare(images):
        return {"images": images}

    def detic(frame):
        boxes = np.zeros((n_cams, n_det, 4), np.float32)
        for i in range(n_det):  # disjoint boxes: NMS suppresses nothing
            boxes[:, i] = [20 * i, 0, 20 * i + 10, 10]
        scores = np.linspace(0.9, 0.5, n_det, dtype=np.float32)[None].repeat(
            n_cams, 0
        )
        cids = np.zeros((n_cams, n_det), np.int32)
        valid = np.ones((n_cams, n_det), bool)
        return boxes, scores, cids, valid

    def sam_encode(frame):
        return None

    def sam_decode_planes(emb, boxes, n_boxes, cam_hw, mask_wh, nw,
                          layout="xy"):
        w, h = mask_wh
        shape = (w, h, nw) if layout == "xy" else (h, w, nw)
        return np.zeros(shape, np.uint32)

    return MaskModels(prepare, detic, sam_encode, sam_decode_planes,
                      CUSTOM_VOCABULARY_NUSCENES)


def test_truncation_counters_over_cap():
    """Detections beyond max_detections / max_masks_total must be COUNTED,
    not silently dropped (VERDICT round-2 weak #3)."""
    from cm3d_tpu.pipelines.masks import start_frame_masks

    models = _stub_models(n_det=10, n_cams=2)
    img = [np.zeros((16, 200, 3), np.uint8)] * 2
    cfg = MaskStageConfig(max_detections=4, max_masks_total=6)
    handle = start_frame_masks(models, img, cfg)
    c = handle["counts"]
    assert c["detections"] == 20
    assert c["nms_suppressed"] == 0
    # each camera: 10 -> 4 at the prompt cap (6 dropped each)
    assert c["dropped_max_detections"] == 12
    # cam0 writes 4, cam1 limited to 6-4=2 of its 4
    assert c["dropped_masks_total"] == 2
    assert c["masks_written"] == 6 == handle["total"]


def test_run_mask_stage_accumulates_counters(tmp_path):
    from cm3d_tpu.utils.observability import MaskCounters

    models = _stub_models(n_det=5)
    cnt = MaskCounters()
    run_mask_stage(
        models, lambda s, f: [np.zeros((16, 100, 3), np.uint8)],
        ["sc"], lambda s: 3, str(tmp_path), verbose=False,
        cfg=MaskStageConfig(max_detections=2, max_masks_total=128),
        counters=cnt,
    )
    assert cnt.frames == 3
    assert cnt.detections == 15
    assert cnt.dropped_max_detections == 9
    assert cnt.masks_written == 6
    assert cnt.dropped_total == 9


@pytest.mark.slow
def test_rect_encode_smoke():
    """SamConfig.rect_encode: non-square encode + decode + planes run and
    produce masks roughly where the square path puts them (numerical
    deviation from the padded-square path is expected and documented)."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from cm3d_tpu.models.sam import SAM_TEST, Sam
    from cm3d_tpu.pipelines.masks import _batched_model_fns
    from cm3d_tpu.models.detic import DETIC_TEST, Detic
    from cm3d_tpu.config import MaskStageConfig
    from cm3d_tpu.pipelines.masks import generate_frame_masks

    rngl = np.random.default_rng(3)
    sam_cfg = dc.replace(SAM_TEST, rect_encode=True)
    sam_model = Sam(sam_cfg)
    sq0 = jnp.zeros((sam_cfg.img_size, sam_cfg.img_size, 3), jnp.float32)
    sam_params = sam_model.init(
        jax.random.PRNGKey(1), sq0, jnp.zeros((1, 4), jnp.float32)
    )["params"]
    detic_model = Detic(DETIC_TEST)
    clf = jnp.asarray(
        rngl.standard_normal((DETIC_TEST.embed_dim, 18)).astype(np.float32)
    )
    detic_params = detic_model.init(
        jax.random.PRNGKey(0), jnp.zeros((64, 64, 3), jnp.float32), clf
    )["params"]
    from cm3d_tpu.vocab import CUSTOM_VOCABULARY_NUSCENES
    models = _batched_model_fns(
        detic_model, detic_params, clf, sam_model, sam_params,
        CUSTOM_VOCABULARY_NUSCENES,
    )
    # images with max side == SAM img_size -> rect fast path (64x48)
    images = [
        (rngl.random((48, sam_cfg.img_size, 3)) * 255).astype(np.uint8)
        for _ in range(2)
    ]
    fm = generate_frame_masks(models, images, MaskStageConfig())
    assert fm.masks.shape[1:] == (sam_cfg.img_size, 48)
    assert len(fm.labels) == fm.masks.shape[0]


def test_truncation_keeps_highest_scores():
    """When a cap binds, the cut must drop the LOWEST-scoring detections
    (review finding, session 11): the pre-cut order is class-major (after
    classwise NMS) or raw detector order, so a plain [:k] kept low-score
    early boxes over high-score late ones. Survivors keep their original
    relative order, so untruncated frames are unchanged."""
    from cm3d_tpu.pipelines.masks import MaskModels, start_frame_masks
    from cm3d_tpu.vocab import CUSTOM_VOCABULARY_NUSCENES

    n_det = 6
    asc = np.linspace(0.1, 0.6, n_det, dtype=np.float32)  # ASCENDING

    def detic(frame):
        boxes = np.zeros((1, n_det, 4), np.float32)
        for i in range(n_det):
            boxes[:, i] = [20 * i, 0, 20 * i + 10, 10]
        return (boxes, asc[None], np.zeros((1, n_det), np.int32),
                np.ones((1, n_det), bool))

    base = _stub_models(n_det)
    models = MaskModels(base.prepare, detic, base.sam_encode,
                        base.sam_decode_planes, CUSTOM_VOCABULARY_NUSCENES)
    img = [np.zeros((16, 200, 3), np.uint8)]
    handle = start_frame_masks(
        models, img,
        MaskStageConfig(max_detections=3, max_masks_total=128,
                        run_nms=False),
    )
    # top-3 of the ascending scores, original relative order preserved
    np.testing.assert_allclose(handle["scores"], asc[3:], rtol=1e-6)
    assert handle["counts"]["dropped_max_detections"] == 3
