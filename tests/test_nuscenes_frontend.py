"""nuScenes frontend on the fabricated dataroot: tables, maps, keyframes,
and the full hermetic slice frontend -> device lift -> writer -> eval."""

import json

import numpy as np
import pytest

from cm3d_tpu.config import LiftStageConfig
from cm3d_tpu.datasets.artifacts import MaskArtifactStore
from cm3d_tpu.datasets.nuscenes import (
    NuScenesFrontend,
    NuScenesMapLite,
    NuScenesTables,
    SubmissionWriter,
    load_gt_for_eval,
)
from nusc_fixture import LOCATION, VERSION, make_fake_nuscenes

SMALL = LiftStageConfig(
    max_points=16384,
    max_masks=32,
    max_points_per_mask=1024,
    max_points_per_camera=8192,
    max_points_in_masks=4096,
    max_lane_points=2048,
)


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("nusc")
    masks = tmp_path_factory.mktemp("masks")
    info = make_fake_nuscenes(root, masks, n_frames=2, n_objects=8)
    return root, masks, info


def test_tables(fake_root):
    root, _, info = fake_root
    nusc = NuScenesTables(root, VERSION)
    scene = nusc.scene_by_name(info["scene_name"])
    assert nusc.count_frames(scene) == 2
    samples = list(nusc.iter_samples(scene))
    assert [s["token"] for s in samples] == info["sample_tokens"]
    assert nusc.scene_location(scene) == LOCATION
    # static objects: velocity ~0 (annotations identical across frames)
    ann = samples[0]["anns"][0]
    vel = nusc.box_velocity(ann)
    assert np.allclose(vel[:2], 0.0, atol=1e-9)


def test_map_lane_discretization(fake_root):
    root, _, _ = fake_root
    nmap = NuScenesMapLite(root, LOCATION)
    pts = nmap.all_lane_points(0.5)
    assert len(pts) > 150  # 4 lanes x 80 m / 0.5 m
    # straight lanes: all yaws among the four cardinal directions
    yaws = np.mod(pts[:, 2], 2 * np.pi)
    cardinal = np.stack([np.abs(np.angle(np.exp(1j * (yaws - y))))
                         for y in [0, np.pi / 2, np.pi, 3 * np.pi / 2]])
    assert (cardinal.min(0) < 1e-6).all()
    # drivable polygon contains origin
    polys = nmap.drivable_polygons()
    assert len(polys) == 1
    ext, holes = polys[0]
    assert ext.shape == (4, 2) and holes == []


def test_frontend_keyframes(fake_root):
    root, masks, info = fake_root
    fe = NuScenesFrontend(root, VERSION, MaskArtifactStore(masks), SMALL)
    kfs = list(fe.iter_scene(info["scene_name"]))
    assert len(kfs) == 2
    kf, meta = kfs[0]
    assert meta.sample_token == info["sample_tokens"][0]
    # sweeps aggregated across both frames (frame 0 chains to frame 1)
    assert kf.points.shape == (SMALL.max_points, 4)
    n_valid = int(kf.point_valid.sum())
    assert n_valid > 8000  # two sweeps of ~4500+ points
    # identity ego pose: global z = sensor z + 1.8
    zs = kf.points[kf.point_valid, 2]
    assert abs(np.median(zs) - 0.1) < 0.3  # ground at ~-1.7 + 1.8
    assert kf.mask_valid.sum() >= 6
    assert kf.lane_valid.sum() > 150


def test_end_to_end_lift_write_eval(fake_root, tmp_path):
    """The hermetic slice: frontend -> jitted lift -> submission -> eval."""
    import jax

    from cm3d_tpu.datasets.types import stack_keyframes
    from cm3d_tpu.parallel import make_keyframe_step_fn

    root, masks, info = fake_root
    fe = NuScenesFrontend(root, VERSION, MaskArtifactStore(masks), SMALL)
    kfs = list(fe.iter_scene(info["scene_name"]))
    batch = stack_keyframes([kf for kf, _ in kfs])
    step = jax.jit(make_keyframe_step_fn(SMALL))
    lift, boxes = step(batch.frames)

    writer = SubmissionWriter()
    for i, (_, meta) in enumerate(kfs):
        writer.add_device_outputs(
            meta.sample_token, jax.tree.map(lambda x: np.asarray(x)[i], boxes)
        )
    sub_path = tmp_path / "submission.json"
    submission = writer.write(str(sub_path))
    n_boxes = sum(len(v) for v in submission["results"].values())
    assert n_boxes >= 8, f"expected boxes for most planted objects, got {n_boxes}"

    # predicted centers should sit near planted objects (sparse background)
    centers = {o["name"]: [] for o in info["objects"]}
    planted = np.array([o["center"] for o in info["objects"]])
    for token, dicts in submission["results"].items():
        for d in dicts:
            dists = np.linalg.norm(
                planted[:, :2] - np.asarray(d["translation"])[:2], axis=1
            )
            # pushback can overshoot by up to l/2 when the assigned lane yaw
            # is oblique to the viewing ray; bound the error accordingly
            thresh = d["size"][1] / 2 + 1.5
            assert dists.min() < thresh, f"box far from every planted object: {d}"

    # evaluate against table GT
    gt, egos, racks, _ = load_gt_for_eval(root, VERSION)
    from cm3d_tpu.eval import DETECTION_CVPR_2019
    from cm3d_tpu.eval.boxes import load_prediction
    from cm3d_tpu.eval.evaluate import DetectionEval

    preds, meta_d = load_prediction(str(sub_path))
    ev = DetectionEval(
        gt_boxes=gt,
        pred_boxes=preds,
        cfg=DETECTION_CVPR_2019,
        ego_translations=egos,
        bikerack_boxes=racks,
        object_only=False,
        verbose=False,
    )
    summary = ev.main()
    # planted classes should be mostly recovered
    assert summary["mean_dist_aps"]["car"] > 0.5
    assert summary["mean_dist_aps"]["pedestrian"] > 0.5
    assert summary["mean_ap"] > 0.15


def test_eval_cli_table_mode(fake_root, tmp_path):
    """python -m cm3d_tpu.eval with --dataroot (GT from the raw tables)."""
    import json

    from cm3d_tpu.eval.__main__ import main as eval_main

    root, masks, info = fake_root
    # build a tiny perfect submission from the fixture GT
    gt, egos, _, _ = load_gt_for_eval(root, VERSION)
    results = {}
    for token in gt.sample_tokens:
        results[token] = []
        for b in gt[token]:
            d = b.serialize()
            d["detection_score"] = 0.9
            results[token].append(d)
    sub = tmp_path / "sub.json"
    json.dump({"meta": {}, "results": results}, open(sub, "w"))
    summary = eval_main([
        str(sub), "--dataroot", str(root), "--version", VERSION,
        "--eval_set", "all", "--output_dir", str(tmp_path / "m"),
        "--verbose", "0",
    ])
    assert summary["mean_ap"] > 0.35  # perfect preds on 4 present classes


def test_box_velocity_devkit_window_doubling(tmp_path):
    """devkit box_velocity: when BOTH neighbors exist the time window
    doubles (prev->next spans two keyframe intervals), so a ~2 s gap gets
    a finite estimate; a single neighbor at the same gap stays NaN."""
    from cm3d_tpu.datasets.nuscenes.tables import NuScenesTables

    root = tmp_path / "nusc"
    ver = root / "v1.0-fake"
    ver.mkdir(parents=True)

    def tok(i):
        return f"t{i:02d}"

    samples = [
        {"token": tok(i), "timestamp": int(i * 1.0e6), "next": "",
         "prev": "", "scene_token": "s", "data": {}, "anns": []}
        for i in range(3)
    ]
    anns = []
    for i, pos in enumerate([(0.0, 0, 0), (2.0, 0, 0), (4.0, 0, 0)]):
        anns.append({
            "token": f"a{i}", "sample_token": tok(i),
            "translation": list(pos), "size": [1, 1, 1],
            "rotation": [1, 0, 0, 0], "category_name": "vehicle.car",
            "prev": f"a{i-1}" if i > 0 else "",
            "next": f"a{i+1}" if i < 2 else "",
            "num_lidar_pts": 5, "num_radar_pts": 0, "attribute_tokens": [],
            "instance_token": "inst",
        })
    tables = {
        "attribute": [], "calibrated_sensor": [], "ego_pose": [],
        "log": [], "scene": [], "sample": samples, "sample_data": [],
        "sample_annotation": anns,
    }
    for name, rows in tables.items():
        (ver / f"{name}.json").write_text(json.dumps(rows))

    nusc = NuScenesTables(root, "v1.0-fake")
    # middle annotation: prev->next spans 2.0 s > 1.5 but <= 3.0 (doubled)
    v = nusc.box_velocity("a1")
    np.testing.assert_allclose(v, [2.0, 0, 0], atol=1e-9)
    # edge annotation: one neighbor, 1.0 s gap -> fine
    np.testing.assert_allclose(nusc.box_velocity("a0"), [2.0, 0, 0],
                               atol=1e-9)
    # single neighbor at 2.0 s: window NOT doubled -> NaN
    anns2 = [dict(a) for a in anns[:2]]
    anns2[0]["next"] = "a1"
    anns2[1]["prev"] = "a0"
    anns2[1]["next"] = ""
    samples2 = [dict(samples[0]), dict(samples[1])]
    samples2[1]["timestamp"] = int(2.0e6)
    tables["sample"] = samples2
    tables["sample_annotation"] = anns2
    for name, rows in tables.items():
        (ver / f"{name}.json").write_text(json.dumps(rows))
    nusc2 = NuScenesTables(root, "v1.0-fake")
    assert np.isnan(nusc2.box_velocity("a0")).all()

    # missing CORE table fails loudly; missing sample_annotation does not
    (ver / "scene.json").unlink()
    with pytest.raises(FileNotFoundError, match="scene"):
        NuScenesTables(root, "v1.0-fake")
    (ver / "scene.json").write_text("[]")
    (ver / "sample_annotation.json").unlink()
    nusc3 = NuScenesTables(root, "v1.0-fake")
    assert nusc3.table("sample_annotation") == []
