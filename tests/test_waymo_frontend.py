"""Waymo frontend: keyframes, lift end-to-end in vehicle frame, GT bin."""

import numpy as np
import jax
import pytest

from cm3d_tpu.config import LiftStageConfig
from cm3d_tpu.datasets.artifacts import MaskArtifactStore
from cm3d_tpu.datasets.waymo.frontend import (
    WaymoFrontend,
    boxes_to_waymo_objects,
    create_gt_bin,
    lane_yaws_from_polyline,
)
from cm3d_tpu.datasets.waymo.proto import decode_objects, LABEL_TYPE_VEHICLE
from waymo_fixture import make_fake_waymo

SMALL = LiftStageConfig(
    num_sweeps=1,
    max_points=32768,
    max_masks=32,
    max_points_per_mask=1024,
    max_points_per_camera=16384,
    max_points_in_masks=8192,
    max_lane_points=1024,
)


@pytest.fixture(scope="module")
def fake_waymo(tmp_path_factory):
    frames = tmp_path_factory.mktemp("wframes")
    masks = tmp_path_factory.mktemp("wmasks")
    info = make_fake_waymo(frames, masks, n_frames=2, n_objects=8)
    return frames, masks, info


def test_lane_yaws_quirk():
    poly = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0]], float)
    out = lane_yaws_from_polyline(poly)
    # second point: dx=1 dy=0 -> 0; third: dy=1 -> pi/2; first copies second
    assert abs(out[1, 2] - 0.0) < 1e-9
    assert abs(out[2, 2] - np.pi / 2) < 1e-9
    assert out[0, 2] == out[1, 2]


def test_waymo_keyframes(fake_waymo):
    frames, masks, info = fake_waymo
    fe = WaymoFrontend(frames, MaskArtifactStore(masks), SMALL)
    assert fe.scene_names() == [info["scene"]]
    kfs = list(fe.iter_scene(info["scene"]))
    assert len(kfs) == 2
    kf, meta = kfs[0]
    assert meta.context_name == "ctx_segment-000"
    assert kf.point_valid.sum() > 2000
    # points are in GLOBAL frame: centered near the pose translation
    med = np.median(kf.points[kf.point_valid, :2], axis=0)
    np.testing.assert_allclose(med, info["pose"][:3, 3][:2], atol=8)
    assert kf.mask_valid.sum() >= 6
    assert kf.lane_valid.sum() > 100


def test_waymo_end_to_end_vehicle_frame(fake_waymo):
    from cm3d_tpu.datasets.types import stack_keyframes
    from cm3d_tpu.parallel import make_keyframe_step_fn

    frames, masks, info = fake_waymo
    fe = WaymoFrontend(frames, MaskArtifactStore(masks), SMALL)
    kfs = list(fe.iter_scene(info["scene"]))
    batch = stack_keyframes([kf for kf, _ in kfs])
    step = jax.jit(make_keyframe_step_fn(SMALL))
    lift, boxes = step(batch.frames)

    planted = np.array([o["center"] for o in info["objects"]])
    total = 0
    for i, (_, meta) in enumerate(kfs):
        objs = boxes_to_waymo_objects(
            meta,
            np.asarray(boxes.centers)[i],
            np.asarray(boxes.sizes)[i],
            np.asarray(boxes.yaws)[i],
            np.asarray(boxes.scores)[i],
            np.asarray(boxes.labels)[i],
            np.asarray(boxes.keep)[i],
        )
        total += len(objs)
        for o in objs:
            # VEHICLE-frame output near a planted object
            c = np.array([o.box.center_x, o.box.center_y])
            d = np.linalg.norm(planted[:, :2] - c[None], axis=1)
            assert d.min() < o.box.length / 2 + 2.0, (o, d.min())
            assert o.frame_timestamp_micros == meta.timestamp_micros
    assert total >= 8


def test_gt_bin_roundtrip(fake_waymo, tmp_path):
    frames, masks, info = fake_waymo
    out = tmp_path / "gt.bin"
    n = create_gt_bin(frames, str(out))
    assert n == 16  # 8 objects x 2 frames
    objs = decode_objects(out.read_bytes())
    assert len(objs) == 16
    vehicles = [o for o in objs if o.type == LABEL_TYPE_VEHICLE]
    assert len(vehicles) == 8  # car+truck x 2 frames
    assert all(o.score == 0.5 for o in objs)
    assert objs[0].context_name == "ctx_segment-000"


def test_iter_scene_skips_corrupt_frames_and_stops_on_truncation(
        fake_waymo, tmp_path, capsys):
    """Failure-detection contract (SURVEY.md §5): a record whose proto is
    garbage (but whose container CRC is valid) drops that frame only; a
    TRUNCATED segment stops the scene with a log; neither crashes. The
    TFRecord reader itself raises clean IOErrors on truncation, not
    struct.error."""
    import pytest

    from cm3d_tpu.datasets.artifacts import MaskArtifactStore
    from cm3d_tpu.datasets.waymo import frame_proto
    from cm3d_tpu.datasets.waymo.frontend import WaymoFrontend
    from cm3d_tpu.datasets.waymo.tfrecord import TFRecordReader, TFRecordWriter

    frames, masks, info = fake_waymo
    fe0 = WaymoFrontend(frames, MaskArtifactStore(masks), SMALL)
    scene = info["scene"]
    payloads = [
        frame_proto.encode_frame_lite(fe0.load_frame(p))
        for p in fe0.frame_files(scene)
    ]

    # corrupt trailing record: valid container framing, garbage proto
    # (named after the real scene so its mask artifacts resolve)
    raw = tmp_path / "raw"
    raw.mkdir()
    with TFRecordWriter(raw / f"{scene}.tfrecord") as w:
        w.write(payloads[0])
        w.write(payloads[1])
        w.write(b"\xff\xff\xff\xffnot a frame proto")
    fe = WaymoFrontend(raw, MaskArtifactStore(masks), SMALL)
    got = list(fe.iter_scene(scene))
    assert len(got) == 2  # both real frames survive, bad record skipped
    assert "corrupt frame skipped" in capsys.readouterr().out

    # truncated segment: first record intact, second cut mid-payload
    raw2 = tmp_path / "raw_trunc"
    raw2.mkdir()
    whole = (raw / f"{scene}.tfrecord").read_bytes()
    head_len = 8 + 4 + len(payloads[0]) + 4
    (raw2 / f"{scene}.tfrecord").write_bytes(whole[: head_len + 8 + 4 + 10])
    fe2 = WaymoFrontend(raw2, MaskArtifactStore(masks), SMALL)
    got2 = list(fe2.iter_scene(scene))
    assert len(got2) == 1  # the intact frame; then a logged stop
    assert "segment unreadable" in capsys.readouterr().out

    with pytest.raises(IOError, match="truncated"):
        list(TFRecordReader(raw2 / f"{scene}.tfrecord"))


def test_build_keyframe_skips_mismatched_pose_npz(fake_waymo, capsys):
    """npz caches bypass parse_frame's pose-shape validation; a frame-lite
    file with a pose image that can't align with the range image is skipped
    with a log (SURVEY.md §5), not an einsum shape crash."""
    frames, masks, info = fake_waymo
    fe = WaymoFrontend(frames, MaskArtifactStore(masks), SMALL)
    scene = info["scene"]
    fr = fe.load_frame(fe.frame_files(scene)[0])
    h, w = fr["range_image"].shape
    fr["range_image_pose"] = np.zeros((h // 2, w, 6), np.float32)
    assert fe.build_keyframe(scene, 0, fr) is None
    assert "range_image_pose" in capsys.readouterr().out
