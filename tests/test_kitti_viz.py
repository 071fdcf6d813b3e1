"""KITTI BEV rasterizer + viz: values match the reference loop semantics."""

import math

import numpy as np

from cm3d_tpu.datasets.kitti.viz import (
    TOP_X_DIVISION,
    TOP_X_MIN,
    TOP_Y_DIVISION,
    TOP_Y_MIN,
    TOP_Z_DIVISION,
    TOP_Z_MIN,
    draw_boxes_on_bev,
    lidar_to_top,
    top_to_image,
)


def test_lidar_to_top_cell_values():
    # three points in one cell, one in another
    pts = np.array(
        [
            [10.05, 5.05, -1.0, 0.3],
            [10.08, 5.08, -0.5, 0.9],   # highest in cell -> its intensity wins
            [10.02, 5.02, -1.9, 0.1],
            [30.0, -10.0, 0.2, 0.5],
        ],
        np.float32,
    )
    top = lidar_to_top(pts)
    zn = top.shape[2] - 2
    x = int((10.05 - TOP_X_MIN) // TOP_X_DIVISION)
    y = int((5.05 - TOP_Y_MIN) // TOP_Y_DIVISION)
    cell = top[-x, -y]  # reference index flip
    # density: log(3+1)/log(32)
    assert abs(cell[zn + 1] - math.log(4) / math.log(32)) < 1e-6
    # top intensity: the highest point's reflectance
    assert abs(cell[zn] - 0.9) < 1e-6
    # slice heights: point at z=-0.5 -> qz = 1.5/0.3 = 5 -> slice 5 clipped? zn=8
    qz = (-0.5 - TOP_Z_MIN) / TOP_Z_DIVISION  # exactly 5.0
    s = int(qz)
    # boundary point: contributes max-height 1.0 to the slice BELOW and 0
    # to its own slice (reference max(0, max_z - z) semantics)
    assert abs(cell[s - 1] - 1.0) < 1e-6
    assert cell[s] == 0.0

    # out-of-crop points excluded
    far = lidar_to_top(np.array([[100.0, 0, 0, 1]], np.float32))
    assert far.sum() == 0


def test_top_to_image_and_bev_drawing(tmp_path):
    rng = np.random.default_rng(1)
    pts = np.concatenate(
        [rng.uniform([1, -25, -1.8], [65, 25, 0.3], (5000, 3)),
         rng.random((5000, 1))], axis=1
    ).astype(np.float32)
    top = lidar_to_top(pts)
    img = top_to_image(top)
    assert img.dtype == np.uint8 and img.shape == top.shape[:2]
    assert img.max() > 0

    # draw a box footprint: needs a calib
    import sys
    sys.path.insert(0, "tests")
    from test_kitti import CALIB_TXT
    from cm3d_tpu.datasets.kitti import Calibration, Object3d

    (tmp_path / "c.txt").write_text(CALIB_TXT)
    calib = Calibration(tmp_path / "c.txt")
    obj = Object3d("Car", 0, 0, 0, np.zeros(4), 1.5, 1.8, 4.2,
                   tuple(calib.project_velo_to_rect(
                       np.array([[20.0, 0, -1.0]]))[0]), 0.0)
    bev = draw_boxes_on_bev(img, [obj], calib)
    assert bev.shape == img.shape + (3,)
    # something red got drawn
    assert (bev[..., 0].astype(int) - bev[..., 1].astype(int) > 50).any()


def test_viewer3d_html_roundtrip(tmp_path):
    """The WebGL viewer embeds the exact point payload + box wireframes."""
    import base64
    import json
    import re
    import sys

    sys.path.insert(0, "tests")
    from test_kitti import CALIB_TXT

    from cm3d_tpu.datasets.kitti import Calibration, Object3d
    from cm3d_tpu.datasets.kitti.viz3d import boxes_to_segments, export_scene_html

    rng = np.random.default_rng(0)
    pts = rng.uniform([1, -25, -1.8, 0], [65, 25, 0.3, 1], (1000, 4)).astype(
        np.float32
    )
    (tmp_path / "c.txt").write_text(CALIB_TXT)
    calib = Calibration(tmp_path / "c.txt")
    obj = Object3d(
        "Pedestrian", 0, 0, 0, np.zeros(4), 1.8, 0.6, 0.7,
        tuple(calib.project_velo_to_rect(np.array([[12.0, 3, -0.5]]))[0]), 0.4,
    )
    out = export_scene_html(pts, str(tmp_path / "v.html"), [obj], calib)
    html = open(out).read()

    meta = json.loads(re.search(r"const META = (\{.*?\});\n", html).group(1))
    assert meta["n"] == 1000
    assert meta["nseg"] == 12  # one box wireframe
    assert meta["labels"][0]["t"] == "Pedestrian"

    b64 = re.search(r'decode\("([A-Za-z0-9+/=]+)"\);   // xyzi', html).group(1)
    back = np.frombuffer(base64.b64decode(b64), np.float32).reshape(-1, 4)
    np.testing.assert_allclose(back, pts, rtol=1e-6)

    # wireframe segments live near the object's velodyne-frame position
    segs, cols, labels = boxes_to_segments([obj], calib)
    assert segs.shape == (12, 2, 3) and cols.shape == (12, 3)
    center = segs.reshape(-1, 3).mean(axis=0)
    np.testing.assert_allclose(center[:2], [12.0, 3.0], atol=1.0)

    # subsampling path
    out2 = export_scene_html(
        pts, str(tmp_path / "v2.html"), max_points=100
    )
    meta2 = json.loads(
        re.search(r"const META = (\{.*?\});\n", open(out2).read()).group(1)
    )
    assert meta2["n"] == 100
