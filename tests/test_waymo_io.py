"""Waymo I/O layer: TFRecord framing, proto codec, range-image kernel."""

import numpy as np
import jax.numpy as jnp
import pytest

from cm3d_tpu.datasets.waymo import (
    TFRecordReader,
    TFRecordWriter,
    WaymoBox,
    WaymoObject,
    decode_objects,
    encode_objects,
    LABEL_TYPE_VEHICLE,
    LABEL_TYPE_PEDESTRIAN,
)
from cm3d_tpu.datasets.waymo.tfrecord import crc32c, masked_crc
from cm3d_tpu.ops.range_image import (
    range_image_to_points,
    points_to_range_image,
    uniform_inclinations,
)

RNG = np.random.default_rng(41)


def test_crc32c_known_vectors():
    # published CRC-32C test vectors
    assert crc32c(b"") == 0x0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"a") == 0xC1D04330


def test_tfrecord_roundtrip(tmp_path):
    payloads = [b"hello", b"", RNG.bytes(1000)]
    p = tmp_path / "x.tfrecord"
    with TFRecordWriter(p) as wr:
        for pl in payloads:
            wr.write(pl)
    got = list(TFRecordReader(p))
    assert got == payloads


def test_tfrecord_crc_detects_corruption(tmp_path):
    p = tmp_path / "x.tfrecord"
    with TFRecordWriter(p) as wr:
        wr.write(b"payload-bytes")
    data = bytearray(p.read_bytes())
    data[14] ^= 0xFF  # flip a payload byte
    p.write_bytes(bytes(data))
    with pytest.raises(IOError):
        list(TFRecordReader(p))


def test_proto_objects_roundtrip():
    objs = [
        WaymoObject(
            box=WaymoBox(1.5, -2.5, 0.5, 2.1, 4.8, 1.6, 0.3),
            type=LABEL_TYPE_VEHICLE,
            id="obj-1",
            num_lidar_points_in_box=42,
            score=0.87,
            frame_timestamp_micros=1234567890123,
            context_name="ctx_abc",
        ),
        WaymoObject(
            box=WaymoBox(-3.0, 7.0, 1.0, 0.8, 0.9, 1.7, -1.2),
            type=LABEL_TYPE_PEDESTRIAN,
            score=0.41,
            frame_timestamp_micros=99,
            context_name="ctx_xyz",
        ),
    ]
    buf = encode_objects(objs)
    back = decode_objects(buf)
    assert len(back) == 2
    for a, b in zip(objs, back):
        assert a.type == b.type
        assert a.context_name == b.context_name
        assert a.frame_timestamp_micros == b.frame_timestamp_micros
        np.testing.assert_allclose(b.score, a.score, rtol=1e-6)
        for f in ("center_x", "center_y", "center_z", "width", "length",
                  "height", "heading"):
            assert getattr(a.box, f) == getattr(b.box, f)
    assert back[0].id == "obj-1"
    assert back[0].num_lidar_points_in_box == 42


def test_proto_skips_unknown_fields():
    from cm3d_tpu.datasets.waymo.proto import _bytes_field, _varint_field

    o = WaymoObject(box=WaymoBox(1, 2, 3, 4, 5, 6, 7), score=0.5)
    buf = _bytes_field(1, o.to_bytes() + _varint_field(99, 7))
    back = decode_objects(buf)
    assert len(back) == 1 and back[0].box.center_x == 1.0


def test_range_image_roundtrip():
    h, w = 32, 256
    incl = uniform_inclinations(h, -0.3, 0.1)
    # non-trivial extrinsic: yaw + offset
    yaw = 0.4
    ext = np.eye(4, dtype=np.float32)
    ext[:2, :2] = [[np.cos(yaw), -np.sin(yaw)], [np.sin(yaw), np.cos(yaw)]]
    ext[:3, 3] = [1.0, -0.5, 2.0]
    ext = jnp.asarray(ext)

    # synthesize a range image, unproject, reproject
    ri = jnp.asarray((RNG.random((h, w)) * 50 + 5).astype(np.float32))
    pts, valid = range_image_to_points(ri, incl, ext)
    assert valid.all()
    ri2 = points_to_range_image(pts, incl, ext, h, w)
    np.testing.assert_allclose(np.asarray(ri2), np.asarray(ri), rtol=1e-3, atol=1e-2)


def test_range_image_invalid_pixels():
    h, w = 4, 16
    incl = uniform_inclinations(h, -0.3, 0.1)
    ri = np.zeros((h, w), np.float32)
    ri[2, 5] = 10.0
    ri[1, 3] = -1.0  # no-return flag
    pts, valid = range_image_to_points(jnp.asarray(ri), incl, jnp.eye(4))
    v = np.asarray(valid).reshape(h, w)
    assert v[2, 5] and not v[1, 3] and v.sum() == 1
