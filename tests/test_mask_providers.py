"""Mask-stage CLI + dataset providers end to end on tiny fixtures.

Drives cm3d_tpu.pipelines.masks.main (the unified rebuild of the three
gen_2d_masks_detic.py forks) for each dataset with --fake_weights, so the
nuScenes/KITTI/Waymo image providers — file layout, JPEG decode, thumbnail,
CLI plumbing — are exercised, not just run_mask_stage with a synthetic
provider.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from cm3d_tpu.datasets.artifacts import MaskArtifactStore
from cm3d_tpu.pipelines import masks as masks_cli


def _run(argv):
    masks_cli.main(argv)


def test_kitti_provider_cli(tmp_path):
    from PIL import Image

    from test_kitti import CALIB_TXT

    root = tmp_path / "kitti"
    for sub in ("calib", "velodyne", "image_2"):
        (root / "training" / sub).mkdir(parents=True)
    for i in range(2):
        (root / "training" / "calib" / f"{i:06d}.txt").write_text(CALIB_TXT)
        np.zeros((8, 4), np.float32).tofile(
            root / "training" / "velodyne" / f"{i:06d}.bin"
        )
        rng = np.random.default_rng(i)
        Image.fromarray(
            (rng.random((96, 320, 3)) * 255).astype(np.uint8)
        ).save(root / "training" / "image_2" / f"{i:06d}.png")

    out = tmp_path / "masks_out"
    _run([
        "--dataset", "kitti", "--dataroot", str(root),
        "--out_dir", str(out), "--fake_weights", "--thumbnail", "128",
    ])
    store = MaskArtifactStore(out)
    assert store.remaining_scenes(["kitti"]) == []  # scene complete
    for f in range(2):
        fm = store.read_frame("kitti", f)
        assert fm is not None
        # single camera: every mask, if any, is cam 0
        assert all(c == 0 for c in fm.cam_nums)


@pytest.mark.slow
def test_waymo_provider_cli(tmp_path):
    from waymo_fixture import make_fake_waymo

    frames_root = tmp_path / "frames"
    make_fake_waymo(frames_root, tmp_path / "planted", n_frames=2)
    out = tmp_path / "masks_out"
    _run([
        "--dataset", "waymo", "--dataroot", str(frames_root),
        "--out_dir", str(out), "--fake_weights", "--thumbnail", "96",
    ])
    store = MaskArtifactStore(out)
    assert store.remaining_scenes(["segment-000"]) == []
    fm = store.read_frame("segment-000", 1)
    assert fm is not None
    if fm.cam_nums:  # five-camera ring
        assert max(fm.cam_nums) < 5


def test_nuscenes_provider_cli(tmp_path):
    from nusc_fixture import make_fake_nuscenes

    root = tmp_path / "nusc"
    make_fake_nuscenes(root, tmp_path / "planted", n_frames=2, n_objects=4)
    out = tmp_path / "masks_out"
    # a wrong version must fail loudly (missing dir != empty dataset)
    with pytest.raises(FileNotFoundError):
        _run([
            "--dataset", "nuscenes", "--dataroot", str(root),
            "--version", "v1.0-mini", "--out_dir", str(out),
            "--fake_weights", "--thumbnail", "96",
        ])
    _run([
        "--dataset", "nuscenes", "--dataroot", str(root),
        "--version", "v1.0-fake", "--out_dir", str(out),
        "--fake_weights", "--thumbnail", "96",
    ])
    store = MaskArtifactStore(out)
    assert store.remaining_scenes(["scene-0001"]) == []
    fm = store.read_frame("scene-0001", 0)
    assert fm is not None


def test_unknown_dataset_rejected(tmp_path):
    with pytest.raises((KeyError, SystemExit)):
        _run([
            "--dataset", "lyft", "--dataroot", str(tmp_path),
            "--out_dir", str(tmp_path / "o"),
        ])
