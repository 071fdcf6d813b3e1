"""Fused Waymo pipeline (raw .tfrecord -> images -> masks -> boxes -> .bin)
vs the two-stage artifact path, same models: the bins must match
object-for-object — proving the packed-plane handoff into
WaymoFrontend.build_keyframe is lossless and the raw-segment ingestion
feeds the fused loop identically to the npz cache.

Reference contract: waymo/gen_2d_masks_detic.py + waymo/2d_to_3d.py glued
by the artifact store; the fused path collapses them into one process.
"""

import dataclasses
import io

import numpy as np

from cm3d_tpu.config import LiftStageConfig, MaskStageConfig
from cm3d_tpu.datasets.artifacts import MaskArtifactStore
from waymo_fixture import make_fake_waymo

# multi-minute model-family/pipeline integration file — excluded from the
# dev tier (`-m "not slow"`); the full suite runs everything
import pytest

pytestmark = pytest.mark.slow

# full-ratio jpgs (1024x664 = the WAYMO_IMAGE_RATIO canvas) so the fused
# plane canvas equals the two-stage frontend canvas
JPG_WH = (1024, 664)
SMALL_W = LiftStageConfig(
    num_sweeps=1, image_ratio=1024.0 / 1920.0,
    sqrt_min_dist_load_filter=False,
    max_points=16384, max_masks=32, max_points_per_mask=512,
    max_points_per_camera=8192, max_points_in_masks=2048,
    max_lane_points=1024,
)
MASK_CFG = MaskStageConfig(max_detections=16, max_masks_total=32)


def _fixed_detic(frame):
    """Deterministic detections (the test targets the plane handoff, not
    the random-weight detector): two boxes per camera, car + pedestrian."""
    c, d = 5, MASK_CFG.max_detections
    boxes = np.zeros((c, d, 4), np.float32)
    boxes[:, 0] = [380, 220, 700, 460]
    boxes[:, 1] = [150, 100, 420, 380]
    scores = np.zeros((c, d), np.float32)
    scores[:, 0], scores[:, 1] = 0.9, 0.7
    classes = np.zeros((c, d), np.int64)
    classes[:, 0], classes[:, 1] = 3, 4  # car, pedestrian
    valid = np.zeros((c, d), bool)
    valid[:, :2] = True
    return boxes, scores, classes, valid


def test_fused_waymo_matches_two_stage(tmp_path):
    from PIL import Image

    from cm3d_tpu.datasets.waymo import frame_proto
    from cm3d_tpu.datasets.waymo.frontend import WaymoFrontend
    from cm3d_tpu.datasets.waymo.proto import decode_objects
    from cm3d_tpu.datasets.waymo.tfrecord import TFRecordWriter
    from cm3d_tpu.pipelines.e2e import run_e2e_waymo
    from cm3d_tpu.pipelines.lift_waymo import run_lift_waymo
    from cm3d_tpu.pipelines.masks import build_fake_models, run_mask_stage

    frames_root = tmp_path / "frames"
    make_fake_waymo(frames_root, tmp_path / "planted", n_frames=2,
                    n_objects=8, jpg_wh=JPG_WH)
    scene = "segment-000"

    # raw .tfrecord segment for the fused path (exercises raw ingestion)
    raw_root = tmp_path / "raw"
    raw_root.mkdir()
    fe = WaymoFrontend(frames_root, MaskArtifactStore("/nonexistent"), SMALL_W)
    with TFRecordWriter(raw_root / f"{scene}.tfrecord") as wtr:
        for path in fe.frame_files(scene):
            wtr.write(frame_proto.encode_frame_lite(fe.load_frame(path)))

    models = dataclasses.replace(build_fake_models(), detic=_fixed_detic)

    # --- two-stage: mask artifacts -> RLE store -> lift -> bin ---
    def provider(scene_, frame):
        fr = fe.load_frame_by_index(scene_, frame)
        images = []
        for buf in fr["cam_images_jpeg"]:
            im = Image.open(io.BytesIO(bytes(buf))).convert("RGB")
            im.thumbnail((1024, 1024))
            images.append(np.asarray(im))
        return images

    mask_dir = tmp_path / "masks"
    run_mask_stage(models, provider, [scene], lambda s: 2, str(mask_dir),
                   MASK_CFG, verbose=False)
    run_lift_waymo(str(frames_root), str(mask_dir), [scene],
                   str(tmp_path / "two.bin"), lift_cfg=SMALL_W,
                   batch_size=2, verbose=False)

    # --- fused path from the RAW segment, same models ---
    n = run_e2e_waymo(str(raw_root), [scene], str(tmp_path / "fused.bin"),
                      models, lift_cfg=SMALL_W, mask_cfg=MASK_CFG,
                      batch_size=2, verbose=False)
    assert n == 2

    two = decode_objects((tmp_path / "two.bin").read_bytes())
    fused = decode_objects((tmp_path / "fused.bin").read_bytes())
    assert len(two) == len(fused) > 0

    # --data_parallel 2 lift is pure DP: byte-identical .bin
    run_lift_waymo(str(frames_root), str(mask_dir), [scene],
                   str(tmp_path / "dp.bin"), lift_cfg=SMALL_W,
                   batch_size=2, verbose=False, data_parallel=2)
    assert (tmp_path / "dp.bin").read_bytes() == \
        (tmp_path / "two.bin").read_bytes()
    for a, b in zip(two, fused):
        assert a.type == b.type
        assert a.frame_timestamp_micros == b.frame_timestamp_micros
        assert a.context_name == b.context_name
        np.testing.assert_allclose(
            [a.box.center_x, a.box.center_y, a.box.center_z],
            [b.box.center_x, b.box.center_y, b.box.center_z], atol=1e-5,
        )
        np.testing.assert_allclose(
            [a.box.width, a.box.length, a.box.height, a.box.heading],
            [b.box.width, b.box.length, b.box.height, b.box.heading],
            atol=1e-5,
        )
        np.testing.assert_allclose(a.score, b.score, atol=1e-6)


def test_e2e_cli_waymo_vocab_and_gdino(monkeypatch, tmp_path):
    """The e2e CLI must mirror the masks CLI's model wiring: Waymo runs get
    the Waymo vocabulary (reference waymo/gen_2d_masks_detic.py:66-87 drops
    cone/barrier) and --detector gdino swaps the detector in."""
    from cm3d_tpu.pipelines import e2e
    from cm3d_tpu.vocab import CUSTOM_VOCABULARY_WAYMO

    seen = {}

    def fake_run(frames_root, scenes, out, models, **kw):
        seen["models"] = models
        return 0

    monkeypatch.setattr(e2e, "run_e2e_waymo", fake_run)
    e2e.main(["--dataset", "waymo", "--dataroot", str(tmp_path),
              "--scenes", "s0", "--out", str(tmp_path / "o.bin"),
              "--fake_weights"])
    assert tuple(seen["models"].vocabulary) == tuple(CUSTOM_VOCABULARY_WAYMO)
    detic_default = seen["models"].detic

    e2e.main(["--dataset", "waymo", "--dataroot", str(tmp_path),
              "--scenes", "s0", "--out", str(tmp_path / "o.bin"),
              "--fake_weights", "--detector", "gdino"])
    assert seen["models"].detic is not detic_default  # gdino swapped in
    assert tuple(seen["models"].vocabulary) == tuple(CUSTOM_VOCABULARY_WAYMO)


def test_waymo_scene_names_dedupes_cache_plus_raw(tmp_path):
    """A scene present as BOTH a frame-lite npz dir and a raw .tfrecord
    (the cache was exported next to its source segment) is listed once."""
    from cm3d_tpu.datasets.waymo.frontend import WaymoFrontend

    (tmp_path / "segment-000").mkdir()
    (tmp_path / "segment-000.tfrecord").write_bytes(b"")
    (tmp_path / "segment-111.tfrecord").write_bytes(b"")
    fe = WaymoFrontend(tmp_path, MaskArtifactStore("/nonexistent"), SMALL_W)
    assert fe.scene_names() == ["segment-000", "segment-111"]


def test_e2e_cli_host_shard(monkeypatch, tmp_path):
    """--host_shard keeps only this process's scene stride and suffixes the
    output per host (same contract as the masks CLI; merge via
    merge_submissions)."""
    import json

    import jax

    from cm3d_tpu.pipelines import e2e

    seen = {}

    def fake_run(frames_root, scenes, out, models, **kw):
        seen["scenes"], seen["out"] = scenes, out
        return 0

    monkeypatch.setattr(e2e, "run_e2e_waymo", fake_run)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    e2e.main(["--dataset", "waymo", "--dataroot", str(tmp_path),
              "--scenes", "s0,s1,s2", "--out", str(tmp_path / "o.bin"),
              "--fake_weights", "--host_shard"])
    assert seen["scenes"] == ["s1"]  # stride [1::2]
    assert seen["out"] == str(tmp_path / "o.bin") + ".host1"

    # merge of disjoint per-host submissions
    (tmp_path / "a.json").write_text(json.dumps(
        {"meta": {"use_camera": True}, "results": {"t0": [{"x": 1}]}}))
    (tmp_path / "b.json").write_text(json.dumps(
        {"meta": {"use_camera": True}, "results": {"t1": [{"x": 2}]}}))
    merged = e2e.merge_submissions(
        [str(tmp_path / "a.json"), str(tmp_path / "b.json")],
        str(tmp_path / "m.json"),
    )
    assert set(merged["results"]) == {"t0", "t1"}
    assert json.loads((tmp_path / "m.json").read_text())["meta"] == {
        "use_camera": True}


def test_merge_host_outputs_waymo_bin_concat(tmp_path):
    """Waymo per-host .bin shards merge by byte concatenation (Objects is
    one repeated field; proto concatenation == message merging), and the
    merged file decodes to the union of the shards."""
    from cm3d_tpu.datasets.waymo.proto import (
        WaymoObject,
        decode_objects,
        encode_objects,
    )
    from cm3d_tpu.pipelines import e2e

    a = tmp_path / "o.bin.host0"
    b = tmp_path / "o.bin.host1"
    a.write_bytes(encode_objects([WaymoObject(id="h0a", score=0.5),
                                  WaymoObject(id="h0b", score=0.25)]))
    b.write_bytes(encode_objects([WaymoObject(id="h1a", score=0.75)]))
    out = tmp_path / "o.bin"
    e2e.merge_host_outputs([str(a), str(b)], str(out), dataset="waymo")
    objs = decode_objects(out.read_bytes())
    assert [o.id for o in objs] == ["h0a", "h0b", "h1a"]
    assert [o.score for o in objs] == [0.5, 0.25, 0.75]


def test_merge_host_outputs_kitti_dirs(tmp_path):
    """KITTI per-host label dirs merge file-wise; a frame id written by two
    shards is a hard error (shards must be disjoint)."""
    import pytest

    from cm3d_tpu.pipelines import e2e

    d0 = tmp_path / "pseudo.host0"
    d1 = tmp_path / "pseudo.host1"
    d0.mkdir(), d1.mkdir()
    (d0 / "000000.txt").write_text("Car 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0.9\n")
    (d1 / "000001.txt").write_text("Pedestrian 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0.8\n")
    out = tmp_path / "pseudo"
    e2e.merge_host_outputs([str(d0), str(d1)], str(out), dataset="kitti")
    assert sorted(p.name for p in out.iterdir()) == ["000000.txt", "000001.txt"]
    assert (out / "000001.txt").read_text().startswith("Pedestrian")

    (d1 / "000000.txt").write_text("dup\n")
    with pytest.raises(FileExistsError):
        e2e.merge_host_outputs([str(d0), str(d1)], str(tmp_path / "p2"),
                               dataset="kitti")
