"""RLE codec (C + numpy paths, byte-identical) and the artifact store."""

import numpy as np
import pytest

from cm3d_tpu.ops import rle
from cm3d_tpu.datasets.artifacts import FrameMasks, MaskArtifactStore

RNG = np.random.default_rng(9)


def test_rle_roundtrip_random():
    for shape in [(1, 1), (7, 5), (64, 48), (576, 1024)]:
        m = (RNG.random(shape) > 0.7).astype(np.uint8)
        out = rle.decode(rle.encode(m))
        np.testing.assert_array_equal(out, m)


def test_rle_known_values():
    # single set pixel: counts are [0, 1] -> "01"
    assert rle.encode(np.array([[1]], np.uint8))["counts"] == b"01"
    # all zeros 2x2: counts [4] -> "4" -> char(4+48)='4'
    assert rle.encode(np.zeros((2, 2), np.uint8))["counts"] == b"4"


def test_rle_c_and_numpy_paths_identical():
    m = (RNG.random((100, 80)) > 0.5).astype(np.uint8)
    c_rle = rle.encode(m)
    np_counts = rle._string_encode_np(
        rle._runs_encode_np(np.asfortranarray(m).ravel(order="F"))
    )
    if rle._lib() is not None:
        assert c_rle["counts"] == np_counts
    # numpy decode of C bytes
    flat = rle._runs_decode_np(rle._string_decode_np(c_rle["counts"]), m.size)
    np.testing.assert_array_equal(flat.reshape(m.shape, order="F"), m)


def test_rle_fortran_order_matters():
    m = np.array([[1, 0], [0, 0]], np.uint8)  # pixel (0,0) set
    # column-major: first element is 1 -> leading zero-run count 0
    assert rle.encode(m)["counts"][0:1] == b"0"


def test_artifact_store_roundtrip(tmp_path):
    store = MaskArtifactStore(tmp_path)
    masks = (RNG.random((3, 32, 24)) > 0.6).astype(np.uint8)
    fm = FrameMasks(
        labels=["car", "pedestrian", "bus"],
        detection_scores=[0.9, 0.5, 0.3],
        cam_nums=[0, 2, 5],
        masks=masks,
    )
    store.write_frame("scene-0001", 7, fm)
    assert store.has_frame("scene-0001", 7)
    back = store.read_frame("scene-0001", 7)
    assert back.labels == fm.labels
    assert back.cam_nums == fm.cam_nums
    np.testing.assert_array_equal(back.masks, masks)
    assert store.frame_numbers("scene-0001") == [7]


def test_artifact_store_reference_layout(tmp_path):
    """The on-disk layout must match the reference contract:
    {scene}/{frame}_data.json + {frame}_masks.pkl with pickled RLE list."""
    import json, pickle

    store = MaskArtifactStore(tmp_path)
    masks = np.zeros((1, 8, 6), np.uint8)
    masks[0, 2:5, 1:4] = 1
    store.write_frame("sc", 0, FrameMasks(["car"], [0.5], [1], masks))
    with open(tmp_path / "sc" / "0_data.json") as f:
        data = json.load(f)
    assert set(data.keys()) == {"labels", "detection_scores", "cam_nums"}
    with open(tmp_path / "sc" / "0_masks.pkl", "rb") as f:
        rles = pickle.load(f)
    assert isinstance(rles, list) and "counts" in rles[0] and "size" in rles[0]
    assert rles[0]["size"] == [8, 6]


def test_artifact_store_resume_and_corruption(tmp_path):
    store = MaskArtifactStore(tmp_path)
    masks = np.ones((1, 4, 4), np.uint8)
    store.write_frame("a", 0, FrameMasks(["car"], [0.1], [0], masks))
    store.mark_scene_complete("a", 1)
    store.mark_scene_complete("b", 3)
    assert store.completed_scenes() == {"a", "b"}
    assert store.remaining_scenes(["a", "b", "c"]) == ["c"]

    # corrupt artifact -> None, not a crash
    (tmp_path / "a" / "0_masks.pkl").write_bytes(b"garbage")
    assert store.read_frame("a", 0) is None
    assert store.read_frame("nope", 5) is None


def test_encode_packed_many_parity_and_edges():
    """Packed-plane -> COCO RLE must be byte-identical to the dense encoder
    in both layouts, including empty / full / pixel-0 / noisy masks."""
    from cm3d_tpu.ops import rle
    from cm3d_tpu.ops.bitmask import pack_masks_np

    rng = np.random.default_rng(3)
    W, H, M = 61, 37, 70  # odd sizes, >2 words of masks
    dense = np.zeros((M, W, H), np.uint8)
    for i in range(M - 4):
        x, y = rng.integers(0, W - 10), rng.integers(0, H - 8)
        dense[i, x : x + 9, y : y + 7] = 1
    dense[M - 4] = 0                    # empty
    dense[M - 3] = 1                    # full
    dense[M - 2, 0, 0] = 1              # set at scan origin
    dense[M - 1] = (rng.random((W, H)) < 0.5).astype(np.uint8)  # noise
    words_xy = pack_masks_np(dense)
    words_yx = np.ascontiguousarray(np.swapaxes(words_xy, 0, 1))

    want = rle.encode_many(dense)
    for got in (
        rle.encode_packed_many(words_xy, M, layout="xy"),
        rle.encode_packed_many(words_yx, M, layout="yx"),
    ):
        assert len(got) == M
        for a, b in zip(got, want):
            assert a["size"] == b["size"] == [W, H]
            assert a["counts"] == b["counts"]
        # and they decode back to the dense masks
        np.testing.assert_array_equal(rle.decode_many(got), dense)

    assert rle.encode_packed_many(words_xy, 0) == []


def test_encode_packed_many_fallback_parity(monkeypatch):
    """The dense fallback (C lib unavailable, or >2048 masks) must be
    byte-identical to the C path in BOTH layouts (regression: the fallback
    used to transpose words a second time, emitting [H, W]-scanned RLEs)."""
    from cm3d_tpu.ops.bitmask import pack_masks_np

    rng = np.random.default_rng(11)
    W, H, M = 23, 17, 5
    dense = (rng.random((M, W, H)) < 0.4).astype(np.uint8)
    words_xy = pack_masks_np(dense)
    words_yx = np.ascontiguousarray(np.swapaxes(words_xy, 0, 1))
    want = rle.encode_many(dense)

    monkeypatch.setattr(rle, "_LIB", None)
    monkeypatch.setattr(rle, "_LIB_TRIED", True)
    for got in (
        rle.encode_packed_many(words_xy, M, layout="xy"),
        rle.encode_packed_many(words_yx, M, layout="yx"),
    ):
        for a, b in zip(got, want):
            assert a["size"] == b["size"] == [W, H]
            assert a["counts"] == b["counts"]
        np.testing.assert_array_equal(rle.decode_many(got), dense)


def test_encode_packed_many_over_2048_masks_uses_fallback():
    """>2048 masks exceeds the C scanner's per-pixel state: must route to
    the dense path and still match the dense encoder."""
    from cm3d_tpu.ops.bitmask import pack_masks_np

    rng = np.random.default_rng(12)
    M = 64 * 32 + 3  # 2051
    dense = np.zeros((M, 6, 4), np.uint8)
    idx = rng.integers(0, M, 40)
    dense[idx, 2, 1] = 1
    dense[idx, 3, 2] = 1
    words = pack_masks_np(dense)
    got = rle.encode_packed_many(words, M, layout="xy")
    want = rle.encode_many(dense)
    assert len(got) == M
    for a, b in zip(got, want):
        assert a["size"] == b["size"] and a["counts"] == b["counts"]


def test_encode_packed_many_rejects_overflow_n_masks():
    words = np.zeros((4, 4, 1), np.uint32)
    with pytest.raises(ValueError, match="plane capacity"):
        rle.encode_packed_many(words, 33, layout="xy")


def test_write_frame_rles_roundtrip(tmp_path):
    """The driver's packed write path produces artifacts read_frame can
    decode identically to the dense write path."""
    from cm3d_tpu.ops import rle
    from cm3d_tpu.ops.bitmask import pack_masks_np

    rng = np.random.default_rng(4)
    masks = (rng.random((3, 16, 12)) < 0.4).astype(np.uint8)
    words = pack_masks_np(masks)
    rles = rle.encode_packed_many(words, 3, layout="xy")

    store = MaskArtifactStore(tmp_path)
    store.write_frame_rles("sc", 7, ["car", "truck", "bicycle"],
                           [0.9, 0.5, 0.2], [0, 1, 1], rles)
    fm = store.read_frame("sc", 7)
    assert fm.labels == ["car", "truck", "bicycle"]
    assert fm.cam_nums == [0, 1, 1]
    np.testing.assert_array_equal(fm.masks, masks)


def test_paste_mask_canvas_rejects_crop():
    """A stored mask LARGER than the read canvas means the artifacts were
    written at a different thumbnail — cropping silently misaligned masks
    with the camera projection; it must raise. Smaller masks still pad
    (the KITTI/Waymo same-scale contract)."""
    import pytest

    from cm3d_tpu.datasets.artifacts import paste_mask_canvas

    dst = np.zeros((1, 64, 32), bool)
    small = np.ones((48, 16), np.uint8)  # [x, y] stored layout -> pads
    paste_mask_canvas(dst, 0, small, 64, 32)
    assert dst[0, :48, :16].all() and not dst[0, 48:].any()

    big = np.ones((128, 40), np.uint8)  # wider than the 64-wide canvas
    with pytest.raises(ValueError, match="exceeds the 64x32 canvas"):
        paste_mask_canvas(np.zeros((1, 64, 32), bool), 0, big, 64, 32)


def test_paste_mask_canvas_y_major_subcanvas():
    """Reference/pycocotools artifacts store y-major [H, W] masks at the
    thumbnailed IMAGE size — possibly SMALLER than the canvas (Waymo's
    shorter side cameras). They must transpose-paste, not raise or paste
    sideways."""
    from cm3d_tpu.datasets.artifacts import paste_mask_canvas

    # Waymo side-camera geometry scaled down: image 64x29 (y-major stored
    # (29, 64)) into a (w=64, h=32) canvas — fits ONLY as y-major
    mk = np.zeros((29, 64), np.uint8)
    mk[3, 10] = 1  # y=3, x=10
    dst = np.zeros((1, 64, 32), bool)
    paste_mask_canvas(dst, 0, mk, 64, 32)
    assert dst[0, 10, 3] and dst[0].sum() == 1

    # ambiguous sub-canvas (fits both ways): a portrait array is taken as
    # y-major — this repo's writers only emit full-canvas landscape masks,
    # so sub-canvas portrait can only be the reference dialect
    amb = np.zeros((10, 20), np.uint8)
    amb[2, 5] = 1  # y=2, x=5 in the y-major reading
    dst2 = np.zeros((1, 64, 32), bool)
    paste_mask_canvas(dst2, 0, amb, 64, 32)
    assert dst2[0, 5, 2] and dst2[0].sum() == 1

    # full-canvas y-major (the exact-(h, w) case) still transposes
    full = np.zeros((32, 64), np.uint8)
    full[1, 7] = 1
    dst3 = np.zeros((1, 64, 32), bool)
    paste_mask_canvas(dst3, 0, full, 64, 32)
    assert dst3[0, 7, 1] and dst3[0].sum() == 1
