"""Fused KITTI pipeline (image_2 -> masks -> boxes -> label txts) vs the
two-stage artifact path, same models: the pred/pseudo txts must match
object-for-object — proving the packed-plane handoff into
KittiFrontend.build_keyframe is lossless (reference flow:
kitti/gen_2d_masks_detic.py + kitti/2d_to_3d.py, whose lifter dead-ends
at :1528; the rebuild's lift_kitti is the working version)."""

import dataclasses
import io

import numpy as np

from cm3d_tpu.config import LiftStageConfig, MaskStageConfig
from cm3d_tpu.datasets.artifacts import MaskArtifactStore
from test_kitti import CALIB_TXT

# multi-minute model-family/pipeline integration file — excluded from the
# dev tier (`-m "not slow"`); the full suite runs everything
import pytest

pytestmark = pytest.mark.slow

JPG_WH = (1024, 320)  # = the default KittiFrontend mask canvas
SMALL_K = LiftStageConfig(
    num_sweeps=1, image_ratio=0.8366, sqrt_min_dist_load_filter=False,
    max_points=8192, max_masks=16, max_points_per_mask=512,
    max_points_per_camera=4096, max_points_in_masks=2048,
    max_lane_points=64,
)
MASK_CFG = MaskStageConfig(max_detections=8, max_masks_total=16)


def _fixed_detic(frame):
    d = MASK_CFG.max_detections
    boxes = np.zeros((1, d, 4), np.float32)
    boxes[:, 0] = [350, 80, 700, 280]
    boxes[:, 1] = [100, 120, 330, 300]
    scores = np.zeros((1, d), np.float32)
    scores[:, 0], scores[:, 1] = 0.9, 0.7
    classes = np.zeros((1, d), np.int64)
    classes[:, 0], classes[:, 1] = 3, 4  # car, pedestrian
    valid = np.zeros((1, d), bool)
    valid[:, :2] = True
    return boxes, scores, classes, valid


def test_fused_kitti_matches_two_stage(tmp_path):
    from PIL import Image

    from cm3d_tpu.datasets.kitti.calib import read_label
    from cm3d_tpu.pipelines.e2e import run_e2e_kitti
    from cm3d_tpu.pipelines.lift_kitti import run_lift_kitti
    from cm3d_tpu.pipelines.masks import build_fake_models, run_mask_stage

    root = tmp_path / "kitti"
    for sub in ("calib", "velodyne", "image_2"):
        (root / "training" / sub).mkdir(parents=True)
    rng = np.random.default_rng(5)
    jw, jh = JPG_WH
    for idx in (0, 1):
        (root / "training" / "calib" / f"{idx:06d}.txt").write_text(CALIB_TXT)
        pts = rng.uniform([-40, -40, -1.8], [40, 40, 1.0], (4000, 3))
        raw = np.zeros((len(pts), 4), np.float32)
        raw[:, :3] = pts
        raw.tofile(root / "training" / "velodyne" / f"{idx:06d}.bin")
        Image.fromarray(
            (rng.random((jh, jw, 3)) * 80 + 60).astype(np.uint8)
        ).save(root / "training" / "image_2" / f"{idx:06d}.png")

    models = dataclasses.replace(build_fake_models(), detic=_fixed_detic)

    # --- two-stage: mask artifacts -> RLE store -> lift CLI ---
    def provider(scene, frame):
        im = Image.open(
            root / "training" / "image_2" / f"{frame:06d}.png"
        ).convert("RGB")
        im.thumbnail((1024, 1024))
        return [np.asarray(im)]

    mask_dir = tmp_path / "masks"
    run_mask_stage(models, provider, ["kitti"], lambda s: 2, str(mask_dir),
                   MASK_CFG, verbose=False)
    run_lift_kitti(str(root), str(mask_dir), [0, 1],
                   str(tmp_path / "two"), SMALL_K, batch_size=2,
                   verbose=False)

    # --- fused path, same models ---
    n = run_e2e_kitti(str(root), [0, 1], str(tmp_path / "fused"), models,
                      lift_cfg=SMALL_K, mask_cfg=MASK_CFG, batch_size=2,
                      verbose=False)
    assert n == 2

    total = 0
    for idx in (0, 1):
        for kind in ("pred", "pseudo"):
            a = read_label(tmp_path / "two" / kind / f"{idx:06d}.txt")
            b = read_label(tmp_path / "fused" / kind / f"{idx:06d}.txt")
            assert len(a) == len(b)
            total += len(a)
            for oa, ob in zip(a, b):
                assert oa.type == ob.type
                np.testing.assert_allclose(oa.t, ob.t, atol=1e-5)
                np.testing.assert_allclose(
                    [oa.w, oa.l, oa.h, oa.ry],
                    [ob.w, ob.l, ob.h, ob.ry], atol=1e-5,
                )
                if kind == "pred":
                    np.testing.assert_allclose(oa.score, ob.score, atol=1e-6)
                else:
                    assert np.isnan(oa.score) and np.isnan(ob.score)
    assert total > 0

    # --data_parallel 2 lift is pure DP: byte-identical label files
    run_lift_kitti(str(root), str(mask_dir), [0, 1],
                   str(tmp_path / "dp"), SMALL_K, batch_size=2,
                   verbose=False, data_parallel=2)
    for idx in (0, 1):
        for kind in ("pred", "pseudo"):
            assert (tmp_path / "dp" / kind / f"{idx:06d}.txt").read_text() \
                == (tmp_path / "two" / kind / f"{idx:06d}.txt").read_text()

    # The pred txts carry PROJECTED 2D boxes (documented deviation from the
    # reference's ltrb=[0,0,0,0], kitti/2d_to_3d.py:1535) and score cleanly
    # through the in-framework devkit-protocol evaluator: with GT := the
    # predictions themselves, every detection is a perfect match.
    import dataclasses as _dc

    from cm3d_tpu.eval.kitti import eval_class

    gt_frames, det_frames = [], []
    for idx in (0, 1):
        preds = read_label(tmp_path / "two" / "pred" / f"{idx:06d}.txt")
        for o in preds:
            assert (o.box2d[3] - o.box2d[1]) > 0, "2D bbox not projected"
        det_frames.append(preds)
        gt_frames.append(
            [_dc.replace(o, truncation=0.0, occlusion=0,
                         score=float("nan")) for o in preds]
        )
    scored_any = False
    for cls in {o.type for f in det_frames for o in f}:
        for metric in ("bbox", "bev", "3d"):
            r = eval_class(gt_frames, det_frames, cls, 2, metric, 0.7)
            if r["n_gt"]:
                assert abs(r["precision"][0] - 1.0) < 1e-9, (cls, metric)
                scored_any = True
    assert scored_any


def test_fused_kitti_mixed_image_sizes(tmp_path):
    """KITTI native image sizes vary per frame (1242x375, 1224x370, ...):
    the fused path must pin the bit-plane canvas (run_fused mask_wh) so
    mask_bits shapes match across frames — a per-frame canvas crashed the
    keyframe stack (review finding, session 11)."""
    from PIL import Image

    from cm3d_tpu.datasets.kitti.calib import read_label
    from cm3d_tpu.pipelines.e2e import run_e2e_kitti
    from cm3d_tpu.pipelines.masks import build_fake_models

    root = tmp_path / "kitti"
    for sub in ("calib", "velodyne", "image_2"):
        (root / "training" / sub).mkdir(parents=True)
    rng = np.random.default_rng(7)
    for idx, (w, h) in enumerate(((1242, 375), (1224, 370))):
        (root / "training" / "calib" / f"{idx:06d}.txt").write_text(CALIB_TXT)
        pts = rng.uniform([-40, -40, -1.8], [40, 40, 1.0], (4000, 3))
        raw = np.zeros((len(pts), 4), np.float32)
        raw[:, :3] = pts
        raw.tofile(root / "training" / "velodyne" / f"{idx:06d}.bin")
        Image.fromarray(
            (rng.random((h, w, 3)) * 80 + 60).astype(np.uint8)
        ).save(root / "training" / "image_2" / f"{idx:06d}.png")

    models = dataclasses.replace(build_fake_models(), detic=_fixed_detic)
    n = run_e2e_kitti(str(root), [0, 1], str(tmp_path / "fused"), models,
                      lift_cfg=SMALL_K, mask_cfg=MASK_CFG, batch_size=2,
                      verbose=False)
    assert n == 2
    for idx in (0, 1):  # both frames produced label files
        assert (tmp_path / "fused" / "pred" / f"{idx:06d}.txt").exists()
        assert (tmp_path / "fused" / "pseudo" / f"{idx:06d}.txt").exists()
    assert sum(
        len(read_label(tmp_path / "fused" / "pred" / f"{i:06d}.txt"))
        for i in (0, 1)
    ) > 0


def test_merge_host_outputs_kitti_pred_pseudo(tmp_path):
    """merge_host_outputs('kitti') must mirror run_e2e_kitti's pred/pseudo
    sublayout (it previously copyfile()d the directories themselves) and
    keep the flat two-stage layout working; duplicate frames raise."""
    import pytest

    from cm3d_tpu.pipelines.e2e import merge_host_outputs

    # run_e2e_kitti layout: {out}/pred + {out}/pseudo per host shard
    for host, idx in ((0, 0), (1, 1)):
        for kind in ("pred", "pseudo"):
            d = tmp_path / f"out.host{host}" / kind
            d.mkdir(parents=True)
            (d / f"{idx:06d}.txt").write_text(f"obj-{kind}-{idx}\n")
    merged = tmp_path / "merged"
    merge_host_outputs(
        [str(tmp_path / "out.host0"), str(tmp_path / "out.host1")],
        str(merged), "kitti",
    )
    for idx in (0, 1):
        for kind in ("pred", "pseudo"):
            assert (merged / kind / f"{idx:06d}.txt").read_text() \
                == f"obj-{kind}-{idx}\n"

    # flat layout (two-stage lift label dirs) still merges
    for host in (0, 1):
        d = tmp_path / f"flat{host}"
        d.mkdir()
        (d / f"{host:06d}.txt").write_text("x\n")
    merge_host_outputs([str(tmp_path / "flat0"), str(tmp_path / "flat1")],
                       str(tmp_path / "mflat"), "kitti")
    assert (tmp_path / "mflat" / "000000.txt").exists()
    assert (tmp_path / "mflat" / "000001.txt").exists()

    # duplicate frame ids across shards must raise
    (tmp_path / "flat1" / "000000.txt").write_text("dup\n")
    with pytest.raises(FileExistsError):
        merge_host_outputs(
            [str(tmp_path / "flat0"), str(tmp_path / "flat1")],
            str(tmp_path / "mdup"), "kitti",
        )


def test_e2e_cli_kitti_run_nms_default(monkeypatch, tmp_path):
    """The fused CLI must preserve the reference's KITTI no-2D-NMS default
    ('wo_2d_nms', kitti/gen_2d_masks_detic.py:781-811) like the masks CLI:
    kitti -> run_nms False unless --run_nms 1; other datasets -> True."""
    from cm3d_tpu.pipelines import e2e

    seen = {}

    def fake_kitti(root, indices, out, models, **kw):
        seen["cfg"] = kw["mask_cfg"]
        return 0

    def fake_nusc(dataroot, version, scenes, out, models, **kw):
        seen["cfg"] = kw["mask_cfg"]
        return {}

    monkeypatch.setattr(e2e, "run_e2e_kitti", fake_kitti)
    monkeypatch.setattr(e2e, "run_e2e", fake_nusc)
    base = ["--dataroot", str(tmp_path), "--scenes", "0",
            "--out", str(tmp_path / "o"), "--fake_weights"]
    e2e.main(["--dataset", "kitti"] + base)
    assert seen["cfg"].run_nms is False
    e2e.main(["--dataset", "kitti", "--run_nms", "1"] + base)
    assert seen["cfg"].run_nms is True
    e2e.main(["--dataset", "nuscenes"] + base)
    assert seen["cfg"].run_nms is True
