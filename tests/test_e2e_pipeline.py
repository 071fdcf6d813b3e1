"""Fused images->masks->boxes pipeline vs the two-stage artifact path.

Same models, same frames: the fused path (device bit-planes straight into
the lift) must produce box-for-box the SAME submission as mask artifacts ->
RLE store -> frontend -> lift, proving the bit-plane handoff is lossless."""

import numpy as np
import pytest

from cm3d_tpu.config import LiftStageConfig, MaskStageConfig
from cm3d_tpu.datasets.artifacts import MaskArtifactStore
from nusc_fixture import VERSION, make_fake_nuscenes

# multi-minute model-family/pipeline integration file — excluded from the
# dev tier (`-m "not slow"`); the full suite runs everything
pytestmark = pytest.mark.slow

# the fixture's camera jpgs are 160x90 (nominal 1600x900 -> ratio 0.1)
SMALL = LiftStageConfig(
    max_points=16384, max_masks=32, max_points_per_mask=512,
    max_points_per_camera=8192, max_points_in_masks=2048,
    max_lane_points=1024, image_ratio=0.1,
)
MASK_CFG = MaskStageConfig(max_detections=16, max_masks_total=32)


@pytest.mark.parametrize("quant", [False, True],
                         ids=["float", "quant_int8"])
def test_fused_e2e_matches_two_stage(tmp_path, capsys, quant):
    """quant=True re-runs the parity with the int8 w8a8 SAM (the detector
    is replaced by a fixed stub either way): the bit-plane handoff must
    stay lossless through the quantized encode/decode too."""
    from PIL import Image

    from cm3d_tpu.datasets.nuscenes.tables import CAM_LIST, NuScenesTables
    from cm3d_tpu.pipelines.e2e import run_e2e
    from cm3d_tpu.pipelines.masks import build_fake_models, run_mask_stage

    root = tmp_path / "data"
    info = make_fake_nuscenes(root, tmp_path / "planted", n_frames=2,
                              n_objects=6)
    scene = info["scene_name"]
    models = build_fake_models(quant_int8=quant)

    # deterministic detections (the test targets the bit-plane HANDOFF, not
    # the random-weight detector): two boxes per camera, car + pedestrian
    import dataclasses

    def fixed_detic(frame):
        c, d = 6, MASK_CFG.max_detections
        boxes = np.zeros((c, d, 4), np.float32)
        boxes[:, 0] = [30, 15, 120, 70]
        boxes[:, 1] = [10, 25, 80, 85]
        scores = np.zeros((c, d), np.float32)
        scores[:, 0], scores[:, 1] = 0.9, 0.7
        classes = np.zeros((c, d), np.int64)
        classes[:, 0], classes[:, 1] = 3, 4  # car, pedestrian
        valid = np.zeros((c, d), bool)
        valid[:, :2] = True
        return boxes, scores, classes, valid

    models = dataclasses.replace(models, detic=fixed_detic)

    # --- two-stage: mask artifacts -> store -> lift ---
    nusc = NuScenesTables(root, VERSION)
    samples = list(nusc.iter_samples(nusc.scene_by_name(scene)))

    def provider(s, frame):
        images = []
        for cam in CAM_LIST:
            sd = nusc.get("sample_data", samples[frame]["data"][cam])
            im = Image.open(root / sd["filename"]).convert("RGB")
            im.thumbnail((1024, 1024))
            images.append(np.asarray(im))
        return images

    mask_dir = tmp_path / "masks"
    run_mask_stage(models, provider, [scene], lambda s: len(samples),
                   str(mask_dir), MASK_CFG, verbose=False)
    from cm3d_tpu.datasets.nuscenes import NuScenesFrontend
    from cm3d_tpu.datasets.types import stack_keyframes
    import jax
    from cm3d_tpu.parallel import make_keyframe_step_fn
    from cm3d_tpu.datasets.nuscenes import SubmissionWriter

    fe = NuScenesFrontend(root, VERSION, MaskArtifactStore(mask_dir), SMALL,
                          mask_wh=(160, 90))
    step = jax.jit(make_keyframe_step_fn(SMALL))
    kfs = list(fe.iter_scene(scene))
    w2 = SubmissionWriter()
    batch = stack_keyframes([kf for kf, _ in kfs])
    _, boxes2 = step(batch.frames)
    for i, (_, meta) in enumerate(kfs):
        w2.add_device_outputs(
            meta.sample_token, jax.tree.map(lambda x: np.asarray(x)[i], boxes2)
        )
    sub_two = w2.write(str(tmp_path / "two.json"))

    # --- fused path, same models ---
    sub_e2e = run_e2e(str(root), VERSION, [scene], str(tmp_path / "e2e.json"),
                      models, lift_cfg=SMALL, mask_cfg=MASK_CFG,
                      batch_size=2, verbose=True, mask_wh=(160, 90))

    # the fused path reports the same truncation counters as run_mask_stage
    import json as _json

    counter_lines = [l for l in capsys.readouterr().out.splitlines()
                     if l.startswith('{"mask_counters"')]
    assert counter_lines, "fused path must print mask counters"
    mc = _json.loads(counter_lines[-1])["mask_counters"]
    assert mc["frames"] == 2 and mc["masks_written"] > 0

    assert set(sub_e2e["results"]) == set(sub_two["results"])
    n_boxes = 0
    for tok in sub_two["results"]:
        a, b = sub_two["results"][tok], sub_e2e["results"][tok]
        assert len(a) == len(b)
        n_boxes += len(a)
        for ba, bb in zip(a, b):
            assert ba["detection_name"] == bb["detection_name"]
            np.testing.assert_allclose(ba["translation"], bb["translation"],
                                       atol=1e-5)
            np.testing.assert_allclose(ba["size"], bb["size"], atol=1e-6)
    assert n_boxes > 0  # the fixture must actually produce boxes


def test_fused_e2e_with_gdino_detector(tmp_path):
    """The alternative detector (--detector gdino) drives the FUSED path
    too: attach_gdino swaps models.detic ahead of the shared SAM prompt
    path, so run_e2e needs no changes — smoke the wiring end to end."""
    from cm3d_tpu.pipelines.e2e import run_e2e
    from cm3d_tpu.pipelines.masks import attach_gdino, build_fake_models

    root = tmp_path / "data"
    info = make_fake_nuscenes(root, tmp_path / "planted", n_frames=1,
                              n_objects=4)
    scene = info["scene_name"]
    models = attach_gdino(
        build_fake_models(), test=True,
        box_threshold=0.0,  # random weights: keep everything
    )
    sub = run_e2e(str(root), VERSION, [scene], str(tmp_path / "g.json"),
                  models, lift_cfg=SMALL, mask_cfg=MASK_CFG,
                  batch_size=1, verbose=False, mask_wh=(160, 90))
    assert len(sub["results"]) == 1  # the keyframe went through the lift


def test_fused_e2e_empty_frames_write_artifacts_and_manifest(tmp_path):
    """A zero-detection frame must still write (empty) reference-layout
    artifacts, and the scene is marked complete only via the in-order
    write path (regression: the IO-prefetch generator used to mark scenes
    complete frames ahead of the writes)."""
    import dataclasses

    from cm3d_tpu.pipelines.e2e import run_e2e
    from cm3d_tpu.pipelines.masks import build_fake_models

    root = tmp_path / "data"
    info = make_fake_nuscenes(root, tmp_path / "planted", n_frames=2,
                              n_objects=6)
    scene = info["scene_name"]

    def no_detic(frame):
        c, d = 6, MASK_CFG.max_detections
        return (np.zeros((c, d, 4), np.float32), np.zeros((c, d), np.float32),
                np.zeros((c, d), np.int64), np.zeros((c, d), bool))

    models = dataclasses.replace(build_fake_models(), detic=no_detic)
    mask_dir = tmp_path / "masks"
    sub = run_e2e(str(root), VERSION, [scene], str(tmp_path / "out.json"),
                  models, lift_cfg=SMALL, mask_cfg=MASK_CFG, batch_size=2,
                  verbose=False, mask_wh=(160, 90), mask_dir=str(mask_dir))

    assert sub["results"] == {}  # nothing lifted
    store = MaskArtifactStore(mask_dir)
    for f in range(2):  # but every frame has (empty) artifacts
        fm = store.read_frame(scene, f)
        assert fm is not None and len(fm.labels) == 0
    assert store.completed_scenes() == {scene}


def test_scale_ratio_for_thumbnail():
    """Non-1024 thumbnails rescale the reference's 1024-calibrated
    intrinsics ratio so projections stay on the mask canvas."""
    from cm3d_tpu.pipelines.e2e import _scale_ratio_for_thumbnail

    cfg = LiftStageConfig(image_ratio=0.64)
    assert _scale_ratio_for_thumbnail(cfg, 1024) is cfg
    scaled = _scale_ratio_for_thumbnail(cfg, 512)
    assert scaled.image_ratio == pytest.approx(0.32)
    assert scaled.max_masks == cfg.max_masks  # everything else untouched
