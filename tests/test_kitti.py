"""KITTI: calib chain, label round-trip, keyframe lift end-to-end."""

import numpy as np
import pytest

from cm3d_tpu.config import LiftStageConfig, SHAPE_PRIORS_CHATGPT
from cm3d_tpu.datasets.artifacts import FrameMasks, MaskArtifactStore
from cm3d_tpu.datasets.kitti import Calibration, Object3d, read_label, write_label
from cm3d_tpu.datasets.kitti.calib import compute_box_3d
from cm3d_tpu.datasets.kitti.frontend import (
    KittiFrontend,
    velo_yaw_to_kitti_ry,
)
from cm3d_tpu.config import KITTI_LIFT

KITTI_IMAGE_RATIO = KITTI_LIFT.image_ratio  # reference 0.8366

RNG = np.random.default_rng(47)

def _make_calib_txt() -> str:
    """KITTI-like calib with EXACT rotations (a hand-typed real file's
    rotation is only ~1e-3 orthonormal, which breaks rigid-inverse
    round-trip tests)."""
    from scipy.spatial.transform import Rotation as R

    r0 = R.from_euler("xyz", [0.004, -0.0085, 0.0101]).as_matrix()
    # velodyne (x fwd, y left, z up) -> camera (x right, y down, z fwd)
    base = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float)
    v2c_r = R.from_euler("xyz", [0.002, -0.001, 0.007]).as_matrix() @ base
    v2c_t = np.array([-0.0246, -0.0613, -0.3321])
    p2 = np.array(
        [[707.0493, 0, 604.0814, 45.75831],
         [0, 707.0493, 180.5066, -0.3454157],
         [0, 0, 1, 0.004981016]]
    )

    def fmt(m):
        return " ".join(repr(float(v)) for v in np.asarray(m).ravel())

    v2c = np.concatenate([v2c_r, v2c_t[:, None]], axis=1)
    return (
        f"P0: {fmt(p2)}\nP1: {fmt(p2)}\nP2: {fmt(p2)}\nP3: {fmt(p2)}\n"
        f"R0_rect: {fmt(r0)}\n"
        f"Tr_velo_to_cam: {fmt(v2c)}\n"
        f"Tr_imu_to_velo: {fmt(np.eye(3, 4))}\n"
    )


CALIB_TXT = _make_calib_txt()


@pytest.fixture()
def kitti_root(tmp_path):
    root = tmp_path / "kitti"
    for sub in ("calib", "velodyne", "label_2", "image_2"):
        (root / "training" / sub).mkdir(parents=True)
    (root / "training" / "calib" / "000000.txt").write_text(CALIB_TXT)
    return root


def test_calibration_chain_roundtrip(kitti_root):
    calib = Calibration(kitti_root / "training" / "calib" / "000000.txt")
    pts = RNG.uniform([-20, -10, -2], [60, 10, 2], (100, 3))
    rect = calib.project_velo_to_rect(pts)
    back = calib.project_rect_to_velo(rect)
    np.testing.assert_allclose(back, pts, atol=1e-5)  # file R is ~orthonormal
    # image backprojection: uv+depth -> rect (in-front points only)
    front = rect[rect[:, 2] > 4]
    img = calib.project_rect_to_image(front)
    uvd = np.concatenate([img, front[:, 2:3]], axis=1)
    rect2 = calib.project_image_to_rect(uvd)
    # devkit backprojection ignores P2[2,3] (w-offset) — approximation error
    # ~ P2[2,3]/z relative, faithful to the reference formula
    np.testing.assert_allclose(rect2, front, atol=0.05)


def test_rect_chain_matches_projection(kitti_root):
    calib = Calibration(kitti_root / "training" / "calib" / "000000.txt")
    a, b, k = calib.rect_chain()
    pts = RNG.uniform([0, -10, -2], [60, 10, 2], (50, 3))
    cam = pts @ a.T + b
    uvw = cam @ k.T
    uv = uvw[:, :2] / uvw[:, 2:3]
    want = calib.project_velo_to_image(pts)
    np.testing.assert_allclose(uv, want, atol=1e-4)


def test_label_roundtrip(tmp_path):
    objs = [
        Object3d("Car", 0.0, 0, -1.57, np.array([100.0, 120, 300, 250]),
                 1.5, 1.7, 4.2, (1.8, 1.6, 8.5), 0.3),
        Object3d("Pedestrian", 0.1, 1, 0.5, np.array([10.0, 20, 50, 90]),
                 1.8, 0.6, 0.8, (-3.0, 1.5, 12.0), -1.2, score=0.77),
    ]
    p = tmp_path / "l.txt"
    write_label(p, objs)
    back = read_label(p)
    assert back[0].type == "Car" and np.isnan(back[0].score)
    assert back[1].score == 0.77
    np.testing.assert_allclose(back[1].t, objs[1].t)
    corners = compute_box_3d(objs[0])
    assert corners.shape == (8, 3)
    # bottom face at y = t_y (camera y points down)
    assert abs(sorted(corners[:, 1])[-1] - 1.6) < 1e-9


def test_velo_yaw_to_ry():
    # velodyne +x (yaw 0) maps to ry = -pi/2
    assert abs(velo_yaw_to_kitti_ry(0.0) + np.pi / 2) < 1e-9
    # wrap stays in [-pi, pi]
    assert -np.pi <= velo_yaw_to_kitti_ry(3.0) <= np.pi


def test_boxes_to_kitti_objects_box2d_and_alpha(kitti_root):
    from cm3d_tpu.datasets.kitti.frontend import boxes_to_kitti_objects

    calib = Calibration(kitti_root / "training" / "calib" / "000000.txt")

    def build(center_velo, image_wh=None):
        return boxes_to_kitti_objects(
            calib,
            np.asarray([center_velo], np.float64),
            np.zeros(1),
            np.array([0.9]),
            np.array([0]),
            np.array([True]),
            classes=["car"],
            image_wh=image_wh,
        )

    # fully visible object: finite bbox, real observation angle
    objs = build([20.0, 0.0, -0.5])
    (o,) = objs
    assert o.box2d[2] > o.box2d[0] and o.box2d[3] > o.box2d[1]
    want_alpha = o.ry - np.arctan2(o.t[0], o.t[2])
    want_alpha = (want_alpha + np.pi) % (2 * np.pi) - np.pi
    assert abs(o.alpha - want_alpha) < 1e-9
    assert o.alpha != -10

    # same object clipped to a tiny image: box shrinks to the image rect
    (oc,) = build([20.0, 0.0, -0.5], image_wh=(640, 200))
    assert oc.box2d[0] >= 0 and oc.box2d[1] >= 0
    assert oc.box2d[2] <= 639 and oc.box2d[3] <= 199
    assert oc.box2d[2] > oc.box2d[0]

    # object straddling the camera near plane (corners behind AND in front):
    # previously zeroed (ignored by eval forever); now near-plane clipped
    (on,) = build([1.2, 0.0, -0.5], image_wh=(1242, 375))
    assert on.box2d[3] > on.box2d[1], "straddling box must keep a 2D bbox"

    # fully behind the camera: no 2D box
    (ob,) = build([-10.0, 0.0, -0.5])
    np.testing.assert_array_equal(ob.box2d, np.zeros(4))


def test_kitti_lift_end_to_end(kitti_root, tmp_path):
    """Planted objects -> masks -> lift CLI -> KITTI label txts."""
    from cm3d_tpu.pipelines.lift_kitti import run_lift_kitti

    calib = Calibration(kitti_root / "training" / "calib" / "000000.txt")
    rng = np.random.default_rng(3)
    mask_w, mask_h = 1024, 320

    objects = []
    pts = [rng.uniform([-40, -40, -1.8], [40, 40, -1.5], (3000, 3))]
    masks, labels, scores = [], [], []
    a, b, k = calib.rect_chain()
    ksc = k * KITTI_IMAGE_RATIO
    ksc[2, 2] = 1.0
    for j, name in enumerate(["car", "pedestrian", "car"]):
        w, l, h = SHAPE_PRIORS_CHATGPT[name]
        center = np.array([rng.uniform(8, 30), rng.uniform(-6, 6), 0.0])
        cluster = center + rng.normal(0, 1, (150, 3)) * np.array([l, w, h]) / 4
        pts.append(cluster)
        cam = a @ center + b
        if cam[2] < 1:
            continue
        uvw = ksc @ cam
        px, py = uvw[0] / uvw[2], uvw[1] / uvw[2]
        if not (5 < px < mask_w - 5 and 5 < py < mask_h - 5):
            continue
        m = np.zeros((mask_w, mask_h), np.uint8)
        rx = max(8, int(700 * KITTI_IMAGE_RATIO * max(l, w) / (2 * cam[2])))
        ry_ = max(8, int(700 * KITTI_IMAGE_RATIO * h / (2 * cam[2])))
        xs = np.arange(mask_w)[:, None]
        ys = np.arange(mask_h)[None, :]
        m[:] = ((xs - px) / rx) ** 2 + ((ys - py) / ry_) ** 2 <= 1
        masks.append(m)
        labels.append(name)
        scores.append(float(rng.uniform(0.5, 1.0)))
        objects.append((name, center))
    assert len(objects) >= 2

    allpts = np.concatenate(pts).astype(np.float32)
    raw = np.zeros((len(allpts), 4), np.float32)
    raw[:, :3] = allpts
    raw.tofile(kitti_root / "training" / "velodyne" / "000000.bin")

    store = MaskArtifactStore(tmp_path / "masks")
    store.write_frame("kitti", 0, FrameMasks(labels, scores, [0] * len(labels),
                                             np.stack(masks)))

    cfg = LiftStageConfig(
        num_sweeps=1, image_ratio=KITTI_IMAGE_RATIO,
        max_points=8192, max_masks=16, max_points_per_mask=512,
        max_points_per_camera=4096, max_points_in_masks=2048,
        max_lane_points=64,
    )
    n = run_lift_kitti(str(kitti_root), str(tmp_path / "masks"), [0],
                       str(tmp_path / "out"), cfg, batch_size=1, verbose=False)
    assert n >= 2
    preds = read_label(tmp_path / "out" / "pred" / "000000.txt")
    pseudo = read_label(tmp_path / "out" / "pseudo" / "000000.txt")
    assert len(preds) == n and len(pseudo) == n
    assert all(not np.isnan(o.score) for o in preds)
    assert all(np.isnan(o.score) for o in pseudo)
    # each pred near a planted object (rect frame)
    for o in preds:
        rect = np.asarray(o.t)
        best = 1e9
        for name, center in objects:
            crect = calib.project_velo_to_rect(center[None])[0]
            best = min(best, np.linalg.norm(rect[[0, 2]] - crect[[0, 2]]))
        assert best < 2.5, (o, best)
        assert o.type in ("Car", "Pedestrian")


def test_project_depth_to_velo_matches_pixelwise_oracle(kitti_root):
    """Vectorized depth unprojection == per-pixel project_image_to_velo
    (the reference's get_depth_pt3d loop), incl. the all-pixels quirk and
    the cbox clip (kitti_utils.py:26,310-330)."""
    from cm3d_tpu.datasets.kitti.calib import CBOX, Calibration

    calib = Calibration(kitti_root / "training" / "calib" / "000000.txt")
    rng = np.random.default_rng(3)
    depth = rng.uniform(0.0, 60.0, (8, 12))
    depth[0, 0] = 0.0  # reference unprojects zero-depth pixels too

    got_all = calib.project_depth_to_velo(depth, constraint_box=False)
    # oracle: explicit per-pixel loop, row-major like get_depth_pt3d
    uvd = np.array([[j, i, depth[i, j]]
                    for i in range(8) for j in range(12)], np.float64)
    want = calib.project_image_to_velo(uvd)
    np.testing.assert_allclose(got_all, want, atol=1e-9)

    got_clipped = calib.project_depth_to_velo(depth, constraint_box=True)
    keep = ((want[:, 0] >= CBOX[0][0]) & (want[:, 0] < CBOX[0][1])
            & (want[:, 1] >= CBOX[1][0]) & (want[:, 1] < CBOX[1][1])
            & (want[:, 2] >= CBOX[2][0]) & (want[:, 2] < CBOX[2][1]))
    np.testing.assert_allclose(got_clipped, want[keep], atol=1e-9)
    assert len(got_clipped) < len(got_all)  # the clip does something


def test_gen_depth_pc_cli(kitti_root, tmp_path):
    """--gen_depth writes float32 [N,4] velodyne .bins with the
    reference's fixed 0.5 intensity (kitti_object.py:510-534)."""
    from PIL import Image

    from cm3d_tpu.datasets.kitti.viz import main as viz_main

    (kitti_root / "training" / "velodyne").mkdir(exist_ok=True)
    np.zeros((4, 4), np.float32).tofile(
        kitti_root / "training" / "velodyne" / "000000.bin")
    (kitti_root / "training" / "depth").mkdir()
    # tall enough to cover the calib's principal row, so rays near the
    # optical axis land inside the cbox z-range
    d16 = (np.full((260, 40), 20.0) * 256).astype(np.uint16)
    Image.fromarray(d16).save(kitti_root / "training" / "depth" / "000000.png")

    out = tmp_path / "depth_pc"
    viz_main(["--dataroot", str(kitti_root), "--indices", "0",
              "--out", str(out), "--gen_depth"])
    pc = np.fromfile(out / "000000.bin", np.float32).reshape(-1, 4)
    assert len(pc) > 0
    np.testing.assert_allclose(pc[:, 3], 0.5)
    # 20 m depth in front of the camera: inside the cbox x-range
    assert (pc[:, 0] > 0).all() and (pc[:, 0] < 70.4).all()


def test_build_keyframe_respects_cfg_image_ratio(kitti_root):
    """cfg.image_ratio reaches the intrinsics (the fused e2e CLI rescales
    it for non-1024 thumbnails; a hardcoded module ratio silently
    misprojected onto the rescaled mask canvas)."""
    store = MaskArtifactStore(str(kitti_root / "masks"))
    mask_w, mask_h = 1024, 320
    (kitti_root / "training" / "velodyne").mkdir(exist_ok=True)
    np.zeros((10, 4), np.float32).tofile(
        kitti_root / "training" / "velodyne" / "000000.bin"
    )
    m = np.zeros((mask_w, mask_h), np.uint8)
    m[100:200, 100:200] = 1
    store.write_frame(
        "kitti", 0,
        FrameMasks(labels=["car"], detection_scores=[0.9], cam_nums=[0],
                   masks=np.stack([m.T])),
    )

    def intr(ratio):
        cfg = LiftStageConfig(
            num_sweeps=1, image_ratio=ratio, max_masks=32,
            max_points=4096, max_points_per_mask=256,
            max_points_per_camera=2048, max_points_in_masks=2048,
            max_lane_points=64,
        )
        fe = KittiFrontend(kitti_root, store, cfg)
        kf, _ = fe.build_keyframe(0)
        return np.asarray(kf.cameras.intrinsics[0])

    k_full = intr(KITTI_IMAGE_RATIO)
    k_half = intr(KITTI_IMAGE_RATIO / 2)
    np.testing.assert_allclose(k_half[:2], k_full[:2] / 2, rtol=1e-6)
    assert k_half[2, 2] == 1.0


def test_lift_kitti_cli_split_wired(kitti_root, tmp_path, monkeypatch):
    """--split testing must reach KittiFrontend (it silently read the
    training split)."""
    from cm3d_tpu.pipelines import lift_kitti

    seen = {}
    real_init = lift_kitti.KittiFrontend.__init__

    def spy(self, root, store, cfg=None, split="training", **kw):
        seen["split"] = split
        real_init(self, root, store, cfg, split=split, **kw)

    monkeypatch.setattr(lift_kitti.KittiFrontend, "__init__", spy)
    (kitti_root / "testing" / "velodyne").mkdir(parents=True, exist_ok=True)
    store = MaskArtifactStore(str(tmp_path / "m2"))
    lift_kitti.run_lift_kitti(
        str(kitti_root), str(tmp_path / "m2"), [], str(tmp_path / "o"),
        split="testing",
    )
    assert seen["split"] == "testing"
