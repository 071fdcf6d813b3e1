"""The reference's commented-out filter blocks as real flags, each flipping
behavior: lane-distance thresholds (2d_to_3d.py:756-758,782-785), drivable-
area filtering (:774-779), and the shape-prior source switch (:385,
get_shape_prior:134-161). Plus lift --resume idempotency (SURVEY.md §5)."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cm3d_tpu.config import (
    CLASS_TO_ID,
    LiftStageConfig,
    SHAPE_PRIORS_CHATGPT,
    SHAPE_PRIORS_DATASET_MEAN,
    class_arrays,
    drivable_class_array,
)
from cm3d_tpu.datasets.nuscenes.maps import rasterize_polygons
from cm3d_tpu.ops.lift import BoxParams, build_boxes

CAR = CLASS_TO_ID["car"]
PED = CLASS_TO_ID["pedestrian"]
TRAILER = CLASS_TO_ID["trailer"]


def _run_build_boxes(centroids, labels, box_params, lane_points=None,
                     drivable_grid=None, drivable_origin=None):
    m = len(centroids)
    priors, is_vehicle, radii = class_arrays()
    if lane_points is None:
        lane_points = np.array([[0.0, 0.0, 0.3]], np.float32)
    lanes = np.asarray(lane_points, np.float32)
    if drivable_grid is None:
        drivable_grid = np.zeros((1, 1), bool)
        drivable_origin = np.zeros(2, np.float32)
    boxes = build_boxes(
        jnp.asarray(np.asarray(centroids, np.float32)),
        jnp.ones(m, bool),
        jnp.asarray(np.asarray(labels, np.int32)),
        jnp.asarray(np.linspace(0.9, 0.5, m, dtype=np.float32)),
        jnp.asarray(lanes),
        jnp.ones(len(lanes), bool),
        jnp.zeros(3, jnp.float32),
        jnp.asarray(priors),
        jnp.asarray(is_vehicle),
        jnp.asarray(radii),
        drivable_class=jnp.asarray(drivable_class_array()),
        drivable_grid=jnp.asarray(drivable_grid),
        drivable_origin=jnp.asarray(drivable_origin, jnp.float32),
        params=box_params,
    )
    return np.asarray(boxes.keep)


def test_lane_dist_filter_flips_behavior():
    # one lane point at origin; centroids spread in x (far apart -> no NMS)
    centroids = [
        [2.0, 0.0, 0.5],   # car 2 m from lane: always kept
        [30.0, 0.0, 0.5],  # car 30 m: > vehicle thresh 4 -> dropped when on
        [40.0, 10.0, 0.5],  # pedestrian ~41 m: > object thresh 20 -> dropped
        [15.0, -10.0, 0.5],  # pedestrian ~18 m: < 20 -> kept either way
    ]
    labels = [CAR, CAR, PED, PED]
    off = _run_build_boxes(centroids, labels, BoxParams(lane_dist_filter=False))
    on = _run_build_boxes(centroids, labels, BoxParams(lane_dist_filter=True))
    assert off.tolist() == [True, True, True, True]
    assert on.tolist() == [True, False, False, True]


def test_drivable_filter_flips_behavior():
    # 20x20-cell grid at 0.5 m covering [0,10)^2, drivable in x<5 only
    grid = np.zeros((20, 20), bool)
    grid[:10, :] = True
    origin = np.zeros(2, np.float32)
    centroids = [
        [2.0, 2.0, 0.5],  # car on road: kept
        [8.0, 2.0, 0.5],  # car off road: dropped when on
        [8.0, 6.0, 0.5],  # trailer off road: exempt (ref :774-777)
        [8.0, 9.0, 0.5],  # pedestrian off road: not a drivable-filter class
        [-5.0, 2.0, 0.5],  # car outside the raster: counts as off-road
    ]
    labels = [CAR, CAR, TRAILER, PED, CAR]
    off = _run_build_boxes(centroids, labels, BoxParams(drivable_filter=False),
                           drivable_grid=grid, drivable_origin=origin)
    on = _run_build_boxes(centroids, labels, BoxParams(drivable_filter=True),
                          drivable_grid=grid, drivable_origin=origin)
    assert off.tolist() == [True, True, True, True, True]
    assert on.tolist() == [True, False, True, True, False]


def test_rasterize_polygons_square_with_hole():
    ext = np.array([[1.0, 1.0], [9.0, 1.0], [9.0, 9.0], [1.0, 9.0]])
    hole = np.array([[4.0, 4.0], [6.0, 4.0], [6.0, 6.0], [4.0, 6.0]])
    grid = rasterize_polygons([(ext, [hole])], (0.0, 0.0), (20, 20), 0.5)
    def cell(x, y):
        return grid[int(x / 0.5), int(y / 0.5)]
    assert cell(2.2, 2.2)          # inside
    assert not cell(5.0, 5.0)      # in the hole
    assert not cell(0.2, 0.2)      # outside
    assert cell(8.7, 8.7)          # inside near the far corner
    # area sanity: 8x8 square minus 2x2 hole = 60 m^2 = 240 cells
    assert abs(int(grid.sum()) - 240) <= 8


def test_prior_source_switch():
    chat, _, _ = class_arrays()
    mean, _, _ = class_arrays(use_chatgpt_priors=False)
    assert np.allclose(chat[CAR], SHAPE_PRIORS_CHATGPT["car"])
    assert np.allclose(mean[CAR], SHAPE_PRIORS_DATASET_MEAN["car"])
    assert not np.allclose(chat, mean)


def test_priors_file_override(tmp_path):
    f = tmp_path / "priors.json"
    json.dump({"vehicle.car": [2.5, 5.5, 2.0]}, open(f, "w"))
    priors, _, _ = class_arrays(priors_file=str(f))
    assert np.allclose(priors[CAR], [2.5, 5.5, 2.0])
    # categories missing from the file fall back to the chatgpt table
    assert np.allclose(priors[PED], SHAPE_PRIORS_CHATGPT["pedestrian"])


def test_step_fn_uses_configured_priors():
    from cm3d_tpu.datasets.synthetic import SyntheticConfig, make_keyframe
    from cm3d_tpu.datasets.types import stack_keyframes
    from cm3d_tpu.parallel import make_keyframe_step_fn

    small = dict(max_points=2048, max_masks=16, max_points_per_mask=256,
                 max_lane_points=512)
    syn = SyntheticConfig(num_cameras=2, image_w=128, image_h=96,
                          points_per_frame=1500, objects_per_frame=6)
    rng = np.random.default_rng(0)
    cfg_a = LiftStageConfig(**small)
    frame = make_keyframe(syn, cfg_a, rng)
    batch = stack_keyframes([frame])
    _, boxes_a = jax.jit(make_keyframe_step_fn(cfg_a))(batch.frames)
    cfg_b = LiftStageConfig(use_chatgpt_priors=False, **small)
    _, boxes_b = jax.jit(make_keyframe_step_fn(cfg_b))(batch.frames)
    ka = np.asarray(boxes_a.keep)
    assert ka.sum() > 0
    # same boxes kept (sizes don't affect medoids) but different extents
    sa = np.asarray(boxes_a.sizes)[ka]
    sb = np.asarray(boxes_b.sizes)[ka]
    assert not np.allclose(sa, sb)


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    from nusc_fixture import make_fake_nuscenes

    tmp = tmp_path_factory.mktemp("resume")
    root = tmp / "data"
    masks = tmp / "masks"
    info = make_fake_nuscenes(root, masks, n_frames=3, n_objects=6)
    return root, masks, info, tmp


SMALL_LIFT = dict(
    max_points=16384, max_masks=32, max_points_per_mask=512,
    max_points_per_camera=8192, max_points_in_masks=2048,
    max_lane_points=1024,
)


def test_lift_resume_is_idempotent(fake_root):
    from nusc_fixture import VERSION
    from cm3d_tpu.pipelines.lift import run_lift

    root, masks, info, tmp = fake_root
    cfg = LiftStageConfig(**SMALL_LIFT)
    scene = info["scene_name"]

    full = run_lift(str(root), VERSION, str(masks), [scene],
                    str(tmp / "full.json"), lift_cfg=cfg, batch_size=2,
                    verbose=False)

    # Simulate a mid-run kill: the output contains only the first sample.
    first_tok = sorted(full["results"])[0]
    partial = {"meta": full["meta"],
               "results": {first_tok: full["results"][first_tok]}}
    json.dump(partial, open(tmp / "resumed.json", "w"))

    resumed = run_lift(str(root), VERSION, str(masks), [scene],
                       str(tmp / "resumed.json"), lift_cfg=cfg, batch_size=2,
                       verbose=False, resume=True)
    assert set(resumed["results"]) == set(full["results"])
    for tok in full["results"]:
        assert resumed["results"][tok] == full["results"][tok]


def test_lift_data_parallel_matches_single_device(fake_root):
    """--data_parallel N on the lift CLI is pure DP over the keyframe
    batch (parallel.sharded_keyframe_step): the submission must match the
    single-device run box for box."""
    import pytest

    from nusc_fixture import VERSION
    from cm3d_tpu.pipelines.lift import run_lift

    root, masks, info, tmp = fake_root
    cfg = LiftStageConfig(**SMALL_LIFT)
    scene = info["scene_name"]

    single = run_lift(str(root), VERSION, str(masks), [scene],
                      str(tmp / "dp_single.json"), lift_cfg=cfg,
                      batch_size=2, verbose=False)
    dp = run_lift(str(root), VERSION, str(masks), [scene],
                  str(tmp / "dp2.json"), lift_cfg=cfg, batch_size=2,
                  verbose=False, data_parallel=2)
    assert dp["results"] == single["results"]
    with pytest.raises(SystemExit, match="divide"):
        run_lift(str(root), VERSION, str(masks), [scene],
                 str(tmp / "dp_bad.json"), lift_cfg=cfg, batch_size=2,
                 verbose=False, data_parallel=3)
    with pytest.raises(SystemExit, match="exceeds"):
        run_lift(str(root), VERSION, str(masks), [scene],
                 str(tmp / "dp_bad.json"), lift_cfg=cfg, batch_size=16,
                 verbose=False, data_parallel=16)
    with pytest.raises(SystemExit, match="positive"):
        run_lift(str(root), VERSION, str(masks), [scene],
                 str(tmp / "dp_bad.json"), lift_cfg=cfg, batch_size=2,
                 verbose=False, data_parallel=-2)


def test_lift_drivable_filter_end_to_end(fake_root):
    """Fixture map's drivable area is the +-60 m square: with the filter on,
    every kept car/truck box must sit inside it; grid crop is exercised."""
    from nusc_fixture import VERSION
    from cm3d_tpu.pipelines.lift import run_lift

    root, masks, info, tmp = fake_root
    cfg = LiftStageConfig(drivable_filter=True, drivable_grid_size=128,
                          **SMALL_LIFT)
    sub = run_lift(str(root), VERSION, str(masks), [info["scene_name"]],
                   str(tmp / "driv.json"), lift_cfg=cfg, batch_size=2,
                   verbose=False)
    n_boxes = sum(len(v) for v in sub["results"].values())
    assert n_boxes > 0
    for boxes in sub["results"].values():
        for b in boxes:
            if b["detection_name"] in ("car", "truck", "bus"):
                x, y = b["translation"][:2]
                assert -61 < x < 61 and -61 < y < 61


def test_get_priors_reference_quirks(fake_root):
    """pipelines/get_priors vs an explicit-quirk oracle (reference
    src/nuscenes/get_priors.py:38,53-58): the LAST sample of every scene
    is skipped and each category's FIRST occurrence is dropped; the CLI
    writes the same dict to JSON."""
    from nusc_fixture import VERSION
    from cm3d_tpu.datasets.nuscenes.tables import NuScenesTables
    from cm3d_tpu.pipelines.get_priors import compute_priors, main

    root, _masks, _info, tmp = fake_root
    avg = compute_priors(str(root), VERSION)

    nusc = NuScenesTables(root, VERSION)
    sizes: dict = {}
    for scene in nusc.table("scene"):
        chain = [nusc.get("sample", scene["first_sample_token"])]
        while chain[-1]["next"] != "":
            chain.append(nusc.get("sample", chain[-1]["next"]))
        for s in chain[:-1]:  # quirk: last sample skipped
            for tok in s["anns"]:
                ann = nusc.get("sample_annotation", tok)
                sizes.setdefault(ann["category_name"], []).append(ann["size"])
    assert sizes, "fixture has no annotations"
    seen_multi = False
    for cat, lst in sizes.items():
        rest = lst[1:]  # quirk: first occurrence dropped
        if rest:
            seen_multi = True
            np.testing.assert_allclose(avg[cat], np.mean(rest, axis=0),
                                       rtol=1e-6)
        else:
            assert cat not in avg
    assert seen_multi
    assert set(avg) == {c for c, lst in sizes.items() if len(lst) > 1}

    out = tmp / "priors_cli.json"
    main(["--dataroot", str(root), "--version", VERSION, "--out", str(out)])
    assert json.loads(out.read_text()) == avg
