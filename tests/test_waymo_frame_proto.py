"""TF-free dataset_pb2.Frame codec: field numbers validated against the
REAL reference binary's embedded descriptors, wire round trips, and raw
.tfrecord ingestion matching the frame-lite npz path bit for bit."""

from pathlib import Path

import numpy as np
import pytest

from cm3d_tpu.datasets.waymo import frame_proto
from cm3d_tpu.datasets.waymo.tfrecord import TFRecordReader, TFRecordWriter

FIXTURES = Path(__file__).parent / "fixtures"

# Every field number frame_proto relies on, keyed by proto message. The
# test below re-derives these from the serialized FileDescriptorProtos
# extracted from the reference's compute_detection_metrics_main ELF —
# the numbers come from reality, not from documentation memory.
EXPECTED_FIELDS = {
    "waymo_dataset_descriptor.bin": {
        "Frame": {"context": 1, "timestamp_micros": 2, "pose": 3,
                  "images": 4, "lasers": 5, "laser_labels": 6,
                  "map_features": 10},
        "Context": {"name": 1, "camera_calibrations": 2,
                    "laser_calibrations": 3},
        "CameraCalibration": {"name": 1, "intrinsic": 2, "extrinsic": 3,
                              "width": 4, "height": 5},
        "LaserCalibration": {"name": 1, "beam_inclinations": 2,
                             "beam_inclination_min": 3,
                             "beam_inclination_max": 4, "extrinsic": 5},
        "Transform": {"transform": 1},
        "Laser": {"name": 1, "ri_return1": 2},
        "RangeImage": {"range_image": 1, "range_image_compressed": 2,
                       "range_image_pose_compressed": 4},
        "MatrixFloat": {"data": 1, "shape": 2},
        "MatrixShape": {"dims": 1},
        "CameraImage": {"name": 1, "image": 2},
    },
    "waymo_map_descriptor.bin": {
        "MapFeature": {"id": 1, "lane": 3},
        "LaneCenter": {"polyline": 8},
        "MapPoint": {"x": 1, "y": 2, "z": 3},
    },
}


def test_field_numbers_match_reference_descriptors():
    pb = pytest.importorskip("google.protobuf")
    from google.protobuf import descriptor_pb2

    for fname, messages in EXPECTED_FIELDS.items():
        fd = descriptor_pb2.FileDescriptorProto()
        fd.ParseFromString((FIXTURES / fname).read_bytes())
        by_msg = {
            mt.name: {f.name: f.number for f in mt.field}
            for mt in fd.message_type
        }
        for msg, fields in messages.items():
            assert msg in by_msg, f"{fname}: {msg} missing"
            for name, num in fields.items():
                assert by_msg[msg].get(name) == num, (
                    f"{msg}.{name}: module assumes {num}, "
                    f"descriptor says {by_msg[msg].get(name)}"
                )
    # MatrixFloat.data must be packed on the wire (the parser's fast path)
    fd = descriptor_pb2.FileDescriptorProto()
    fd.ParseFromString(
        (FIXTURES / "waymo_dataset_descriptor.bin").read_bytes()
    )
    mf = next(m for m in fd.message_type if m.name == "MatrixFloat")
    data = next(f for f in mf.field if f.name == "data")
    assert data.options.packed


def _fake_frame_lite(seed=0, n_cams=3, n_labels=4):
    rng = np.random.default_rng(seed)
    h, w = 8, 16
    return {
        "context_name": "ctx_roundtrip",
        "timestamp_micros": np.int64(123_456_789),
        "pose": np.asarray(np.eye(4) + rng.normal(0, 0.01, (4, 4))),
        "range_image": rng.uniform(0, 75, (h, w)).astype(np.float32),
        "inclinations": np.linspace(0.1, -0.3, h).astype(np.float32),
        "lidar_extrinsic": np.diag([1.0, 1, 1, 1]),
        "cam_intrinsic": rng.uniform(100, 2000, (n_cams, 9)),
        "cam_extrinsic": np.stack([np.eye(4)] * n_cams),
        "cam_images_jpeg": np.array(
            [np.frombuffer(bytes([i] * (10 + i)), np.uint8)
             for i in range(n_cams)],
            dtype=object,
        ),
        "lane_polylines": np.array(
            [rng.uniform(-50, 50, (7, 3)), rng.uniform(-50, 50, (3, 3))],
            dtype=object,
        ),
        "labels_box": rng.uniform(-20, 20, (n_labels, 7)),
        "labels_type": np.array([1, 2, 4, 1], np.int32),
        "labels_num_points": np.array([10, 0, 5, 99], np.int32),
        "labels_id": np.array([f"id{i}" for i in range(n_labels)]),
    }


def test_frame_wire_roundtrip():
    fr = _fake_frame_lite()
    buf = frame_proto.encode_frame_lite(fr)
    back = frame_proto.parse_frame(buf)
    assert back["context_name"] == fr["context_name"]
    assert back["timestamp_micros"] == fr["timestamp_micros"]
    np.testing.assert_allclose(back["pose"], fr["pose"], rtol=0, atol=0)
    np.testing.assert_array_equal(back["range_image"], fr["range_image"])
    np.testing.assert_array_equal(back["inclinations"], fr["inclinations"])
    np.testing.assert_array_equal(
        back["lidar_extrinsic"], fr["lidar_extrinsic"]
    )
    np.testing.assert_array_equal(back["cam_intrinsic"], fr["cam_intrinsic"])
    np.testing.assert_array_equal(back["cam_extrinsic"], fr["cam_extrinsic"])
    for a, b in zip(back["cam_images_jpeg"], fr["cam_images_jpeg"]):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(back["lane_polylines"], fr["lane_polylines"]):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(back["labels_box"], fr["labels_box"])
    np.testing.assert_array_equal(back["labels_type"], fr["labels_type"])
    np.testing.assert_array_equal(
        back["labels_num_points"], fr["labels_num_points"]
    )
    np.testing.assert_array_equal(back["labels_id"], fr["labels_id"])


def test_parse_frame_accepts_uncompressed_and_missing_inclinations():
    fr = _fake_frame_lite()
    # drop per-beam inclinations: parser derives uniform spacing from
    # min/max (frame_utils semantics)
    from cm3d_tpu.datasets.waymo.frame_proto import (
        LASER_TOP, _bytes_field, _double_field, _encode_matrix_float,
        _encode_transform, _varint_field,
    )

    ri = np.zeros(fr["range_image"].shape + (4,), np.float32)
    ri[..., 0] = fr["range_image"]
    laser_calib = b"".join([
        _varint_field(1, LASER_TOP),
        _double_field(3, -0.3),  # min
        _double_field(4, 0.1),  # max
        _bytes_field(5, _encode_transform(fr["lidar_extrinsic"])),
    ])
    context = _bytes_field(1, b"u") + _bytes_field(3, laser_calib)
    # deprecated UNCOMPRESSED MatrixFloat (field 1)
    ri_msg = _bytes_field(1, _encode_matrix_float(ri))
    laser = _bytes_field(
        5, _varint_field(1, LASER_TOP) + _bytes_field(2, ri_msg)
    )
    buf = _bytes_field(1, context) + _varint_field(2, 7) + laser
    back = frame_proto.parse_frame(buf)
    np.testing.assert_array_equal(back["range_image"], fr["range_image"])
    h = fr["range_image"].shape[0]
    ratios = (np.arange(h) + 0.5) / h
    np.testing.assert_allclose(
        back["inclinations"], (0.1 + ratios * (-0.3 - 0.1)).astype(np.float32)
    )


def _npz_scene_to_tfrecord(frames_root: Path, scene: str, out: Path):
    from cm3d_tpu.datasets.artifacts import MaskArtifactStore
    from cm3d_tpu.datasets.waymo.frontend import WaymoFrontend

    fe = WaymoFrontend(frames_root, MaskArtifactStore("/nonexistent"))
    with TFRecordWriter(out) as wtr:
        for path in fe.frame_files(scene):
            wtr.write(frame_proto.encode_frame_lite(fe.load_frame(path)))


@pytest.mark.slow
def test_raw_segment_matches_npz_path(tmp_path):
    """A raw .tfrecord segment must produce byte-identical keyframes to the
    frame-lite npz cache of the same frames."""
    import jax

    from cm3d_tpu.datasets.artifacts import MaskArtifactStore
    from cm3d_tpu.datasets.waymo.frontend import WaymoFrontend
    from tests.waymo_fixture import make_fake_waymo

    npz_root = tmp_path / "npz"
    raw_root = tmp_path / "raw"
    raw_root.mkdir()
    mask_dir = tmp_path / "masks"
    info = make_fake_waymo(npz_root, mask_dir, n_frames=2)
    scene = info["scene"]
    _npz_scene_to_tfrecord(npz_root, scene, raw_root / f"{scene}.tfrecord")

    store = MaskArtifactStore(mask_dir)
    fe_npz = WaymoFrontend(npz_root, store)
    fe_raw = WaymoFrontend(raw_root, store)
    assert fe_raw.scene_names() == [scene]
    assert fe_raw.num_frames(scene) == fe_npz.num_frames(scene) == 2

    # random access parity
    fr_a = fe_npz.load_frame_by_index(scene, 1)
    fr_b = fe_raw.load_frame_by_index(scene, 1)
    np.testing.assert_array_equal(fr_a["range_image"], fr_b["range_image"])
    np.testing.assert_array_equal(fr_a["pose"], fr_b["pose"])

    # full keyframe parity through build_keyframe
    for (kf_a, meta_a), (kf_b, meta_b) in zip(
        fe_npz.iter_scene(scene), fe_raw.iter_scene(scene)
    ):
        assert meta_a.context_name == meta_b.context_name
        assert meta_a.timestamp_micros == meta_b.timestamp_micros
        for leaf_a, leaf_b in zip(
            jax.tree.leaves(kf_a), jax.tree.leaves(kf_b)
        ):
            np.testing.assert_array_equal(
                np.asarray(leaf_a), np.asarray(leaf_b)
            )


def test_create_gt_bin_from_raw_segment(tmp_path):
    from cm3d_tpu.datasets.waymo.frontend import create_gt_bin
    from tests.waymo_fixture import make_fake_waymo

    npz_root = tmp_path / "npz"
    raw_root = tmp_path / "raw"
    raw_root.mkdir()
    make_fake_waymo(npz_root, tmp_path / "masks", n_frames=2)
    scene = "segment-000"
    _npz_scene_to_tfrecord(npz_root, scene, raw_root / f"{scene}.tfrecord")

    a, b = tmp_path / "gt_npz.bin", tmp_path / "gt_raw.bin"
    n_a = create_gt_bin(npz_root, str(a))
    n_b = create_gt_bin(raw_root, str(b))
    assert n_a == n_b > 0
    # identical proto bytes modulo float64->wire round trip (exact: both
    # paths serialize the same doubles)
    assert a.read_bytes() == b.read_bytes()


def test_equal_length_payloads_stay_1d_object_arrays():
    """np.array(list-of-equal-length-arrays, dtype=object) collapses to a
    2-D object array whose rows yield pointer garbage under bytes(); the
    codec must keep cam_images_jpeg and lane_polylines 1-D per-item object
    arrays even when every payload has the same length (single camera,
    equal-size JPEGs, equal-point polylines)."""
    fr = _fake_frame_lite()
    same = b"\xff\xd8" + b"A" * 40  # identical fake JPEG bytes
    fr["cam_images_jpeg"] = frame_proto._object_array(
        [np.frombuffer(same, np.uint8).copy() for _ in range(3)]
    )
    fr["lane_polylines"] = frame_proto._object_array(
        [np.arange(12, dtype=np.float64).reshape(4, 3) for _ in range(2)]
    )
    back = frame_proto.parse_frame(frame_proto.encode_frame_lite(fr))
    imgs = back["cam_images_jpeg"]
    assert imgs.dtype == object and imgs.ndim == 1 and len(imgs) == 3
    assert bytes(bytearray(imgs[0])) == same
    lanes = back["lane_polylines"]
    assert lanes.dtype == object and lanes.ndim == 1 and len(lanes) == 2
    assert lanes[0].shape == (4, 3)

    # truncated submessage fails loudly instead of short-parsing
    import pytest

    buf = frame_proto.encode_frame_lite(fr)
    with pytest.raises(ValueError, match="truncated"):
        frame_proto.parse_frame(buf[:-7])


def test_rolling_shutter_pose_roundtrip_and_correction():
    """TOP rolling-shutter pixel pose (RangeImage field 4): survives the
    wire round trip; pixel poses equal to the frame pose are a NET
    IDENTITY on the unprojected points; a translated pixel pose shifts
    them exactly (reference passes range_image_top_pose into
    convert_range_image_to_point_cloud, waymo/2d_to_3d.py:473-474)."""
    import jax.numpy as jnp

    from cm3d_tpu.ops.range_image import (
        pixel_pose_matrices,
        range_image_to_points,
    )

    fr = _fake_frame_lite()
    h, w = fr["range_image"].shape
    rng = np.random.default_rng(3)

    # frame pose: a nontrivial yaw+translation; pixel pose == frame pose
    yaw = 0.7
    pose = np.eye(4)
    pose[:2, :2] = [[np.cos(yaw), -np.sin(yaw)], [np.sin(yaw), np.cos(yaw)]]
    pose[:3, 3] = [10.0, -4.0, 1.0]
    fr["pose"] = pose
    pose6 = np.zeros((h, w, 6), np.float32)
    pose6[..., 2] = yaw
    pose6[..., 3:6] = pose[:3, 3]
    fr["range_image_pose"] = pose6

    back = frame_proto.parse_frame(frame_proto.encode_frame_lite(fr))
    np.testing.assert_allclose(back["range_image_pose"], pose6, atol=1e-7)

    mats = pixel_pose_matrices(jnp.asarray(pose6))
    np.testing.assert_allclose(np.asarray(mats[0, 0]), pose, atol=1e-6)

    plain, _ = range_image_to_points(
        jnp.asarray(fr["range_image"]), jnp.asarray(fr["inclinations"]),
        jnp.asarray(fr["lidar_extrinsic"], jnp.float32),
    )
    corrected, _ = range_image_to_points(
        jnp.asarray(fr["range_image"]), jnp.asarray(fr["inclinations"]),
        jnp.asarray(fr["lidar_extrinsic"], jnp.float32),
        pixel_pose=mats,
        frame_pose_inv=jnp.asarray(np.linalg.inv(pose), jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(corrected), np.asarray(plain),
                               atol=1e-4)

    # ego moved +1 m in x between pixel capture and frame time
    pose6_shift = pose6.copy()
    pose6_shift[..., 3] += 1.0
    shifted, _ = range_image_to_points(
        jnp.asarray(fr["range_image"]), jnp.asarray(fr["inclinations"]),
        jnp.asarray(fr["lidar_extrinsic"], jnp.float32),
        pixel_pose=pixel_pose_matrices(jnp.asarray(pose6_shift)),
        frame_pose_inv=jnp.asarray(np.linalg.inv(pose), jnp.float32),
    )
    delta = np.asarray(shifted) - np.asarray(plain)
    # +1 m global-x maps through inv(pose)'s rotation
    want = np.linalg.inv(pose)[:3, :3] @ [1.0, 0, 0]
    np.testing.assert_allclose(delta, np.broadcast_to(want, delta.shape),
                               atol=1e-4)


def test_pose_image_contracts():
    """want_pose=False skips the pose-image decode entirely; a pose image
    that parses but can't align with the range image fails parse_frame
    loudly (feeding iter_scene's skip-and-log); pixel_pose without
    frame_pose_inv is a hard error (frame_utils raises the same — the
    output would silently be GLOBAL-frame)."""
    import jax.numpy as jnp
    import pytest

    from cm3d_tpu.ops.range_image import (
        pixel_pose_matrices,
        range_image_to_points,
    )

    fr = _fake_frame_lite()
    h, w = fr["range_image"].shape
    pose6 = np.zeros((h, w, 6), np.float32)
    pose6[..., 3] = 5.0
    fr["range_image_pose"] = pose6
    buf = frame_proto.encode_frame_lite(fr)

    lean = frame_proto.parse_frame(buf, want_pose=False)
    assert lean["range_image_pose"].size == 0
    np.testing.assert_allclose(lean["range_image"], fr["range_image"],
                               atol=1e-7)

    bad = dict(fr)
    bad["range_image_pose"] = pose6[: h // 2]
    with pytest.raises(ValueError, match="range_image_pose"):
        frame_proto.parse_frame(frame_proto.encode_frame_lite(bad))

    with pytest.raises(ValueError, match="frame_pose_inv"):
        range_image_to_points(
            jnp.asarray(fr["range_image"]),
            jnp.asarray(fr["inclinations"]),
            jnp.asarray(fr["lidar_extrinsic"], jnp.float32),
            pixel_pose=pixel_pose_matrices(jnp.asarray(pose6)),
        )
