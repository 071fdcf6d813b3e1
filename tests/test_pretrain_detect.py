"""Pretrain checkpoint/resume + trained-detector inference (semi-sup loop).

BASELINE config 5 end to end inside the framework: pseudo-labels ->
pipelines/pretrain.py (now with kill-and-restart resume of the FULL train
state) -> pipelines/detect.py -> a standard submission JSON the eval
deserializer accepts.
"""

import json

import jax
import numpy as np

from cm3d_tpu.train import CenterPointConfig, PillarConfig
from nusc_fixture import VERSION, make_fake_nuscenes

# multi-minute model-family/pipeline integration file — excluded from the
# dev tier (`-m "not slow"`); the full suite runs everything
import pytest

pytestmark = pytest.mark.slow

PILLAR = PillarConfig(x_min=-25.6, x_max=25.6, y_min=-25.6, y_max=25.6,
                      resolution=0.8)
MODEL = CenterPointConfig(trunk_channels=(16, 16), head_channels=16)


def _setup(tmp_path):
    """Fixture dataroot + a pseudo-label submission JSON over its samples."""
    from cm3d_tpu.datasets.nuscenes.tables import NuScenesTables

    root = tmp_path / "nusc"
    make_fake_nuscenes(root, tmp_path / "planted", n_frames=3, n_objects=2)
    nusc = NuScenesTables(root, VERSION)
    results = {}
    rng = np.random.default_rng(7)
    for sample in nusc.table("sample"):
        ego_t = np.asarray(
            nusc.sample_lidar_ego_pose(sample)["translation"], np.float64
        )
        boxes = []
        for name, off in (("car", (5.0, 3.0)), ("pedestrian", (-4.0, 6.0))):
            t = ego_t + [off[0] + rng.normal(0, 0.5),
                         off[1] + rng.normal(0, 0.5), 0.0]
            boxes.append({
                "sample_token": sample["token"],
                "translation": [float(v) for v in t],
                "size": [1.8, 4.5, 1.4] if name == "car" else [0.7, 0.7, 1.7],
                "rotation": [1.0, 0.0, 0.0, 0.0],
                "velocity": [0, 0],
                "detection_name": name,
                "detection_score": 0.9,
                "attribute_name": "",
            })
        results[sample["token"]] = boxes
    labels = tmp_path / "labels.json"
    labels.write_text(json.dumps({"meta": {}, "results": results}))
    return root, str(labels)


def _train(root, labels, out_dir, **kw):
    from cm3d_tpu.pipelines.pretrain import run_pretrain

    base = dict(steps=6, batch_size=2, learning_rate=1e-3, verbose=False,
                pillar_cfg=PILLAR, model_cfg=MODEL)
    base.update(kw)
    return run_pretrain(str(root), VERSION, labels, str(out_dir), **base)


def test_pretrain_resume_matches_uninterrupted(tmp_path):
    """Kill-and-restart: 3 steps + save + resume to 6 must equal an
    uninterrupted 6-step run — full TrainState (opt state included) round-
    trips through orbax and the (seed, step)-keyed sampling replays."""
    from cm3d_tpu.models.checkpoints import load_params

    root, labels = _setup(tmp_path)
    _train(root, labels, tmp_path / "A")
    _train(root, labels, tmp_path / "B", steps=3, save_every=3)
    _train(root, labels, tmp_path / "B", steps=6, save_every=3, resume=True)

    a = load_params(str(tmp_path / "A" / "centerpoint"))
    b = load_params(str(tmp_path / "B" / "centerpoint"))
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-7
        ),
        a, b,
    )


def test_pretrain_data_parallel_matches_single_device(tmp_path):
    """--data_parallel N is pure DP over the same GLOBAL batch: the
    trained checkpoint must match the single-device run (GSPMD all-reduce
    is the only difference), and N must divide the global batch size."""
    import pytest

    from cm3d_tpu.models.checkpoints import load_params

    root, labels = _setup(tmp_path)
    _train(root, labels, tmp_path / "single")
    _train(root, labels, tmp_path / "dp", data_parallel=2)
    a = load_params(str(tmp_path / "single" / "centerpoint"))
    b = load_params(str(tmp_path / "dp" / "centerpoint"))
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-6
        ),
        a, b,
    )
    with pytest.raises(SystemExit, match="divide"):
        _train(root, labels, tmp_path / "bad", data_parallel=3,
               batch_size=2)


def test_pretrain_resume_without_checkpoint_fails(tmp_path):
    import pytest

    root, labels = _setup(tmp_path)
    with pytest.raises(SystemExit, match="no state_"):
        _train(root, labels, tmp_path / "empty", resume=True)


def test_detect_writes_eval_ready_submission(tmp_path):
    from cm3d_tpu.datasets.nuscenes.tables import NuScenesTables
    from cm3d_tpu.eval.boxes import EvalBoxes
    from cm3d_tpu.pipelines.detect import run_detect

    root, labels = _setup(tmp_path)
    out = tmp_path / "ck"
    _train(root, labels, out, steps=2)

    sub = run_detect(
        str(root), VERSION, str(out / "centerpoint"),
        str(tmp_path / "det.json"), batch_size=2, top_k=16,
        score_thresh=0.0, max_points=4096,
        pillar_cfg=PILLAR, model_cfg=MODEL, verbose=False,
    )
    nusc = NuScenesTables(root, VERSION)
    tokens = {s["token"] for s in nusc.table("sample")}
    assert set(sub["results"]) == tokens
    assert json.loads((tmp_path / "det.json").read_text())["results"]

    # --data_parallel 2 inference is pure DP: identical submission
    dp = run_detect(
        str(root), VERSION, str(out / "centerpoint"),
        str(tmp_path / "det_dp.json"), batch_size=2, top_k=16,
        score_thresh=0.0, max_points=4096,
        pillar_cfg=PILLAR, model_cfg=MODEL, verbose=False, data_parallel=2,
    )
    assert dp["results"] == sub["results"]

    # the eval stack must accept the schema verbatim
    eb = EvalBoxes.deserialize(sub["results"])
    n_boxes = 0
    for token in tokens:
        for box in eb[token]:
            n_boxes += 1
            assert 0.0 <= box.detection_score <= 1.0
            assert all(s > 0 for s in box.size)  # exp-decoded sizes
            q = np.asarray(box.rotation)
            np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-6)
    assert n_boxes > 0  # score_thresh=0: circle NMS keeps at least the top box

    # full semi-sup loop: score the trained detector's submission through
    # the eval CLI against the fixture GT (a 2-step random-init detector
    # scores ~0 mAP — the point is that every stage CONNECTS)
    from cm3d_tpu.datasets.nuscenes import load_gt_for_eval
    from cm3d_tpu.eval.__main__ import main as eval_main

    gt, egos, _, _ = load_gt_for_eval(root, VERSION)
    (tmp_path / "gt.json").write_text(json.dumps(
        {"ego_translations": {k: list(v) for k, v in egos.items()},
         "boxes": gt.serialize()}
    ))
    summary = eval_main([
        str(tmp_path / "det.json"), "--gt_json", str(tmp_path / "gt.json"),
        "--output_dir", str(tmp_path / "metrics"), "--verbose", "0",
    ])
    assert np.isfinite(summary["mean_ap"]) and np.isfinite(summary["nd_score"])


def test_detect_scene_filter(tmp_path):
    from cm3d_tpu.datasets.nuscenes.tables import NuScenesTables
    from cm3d_tpu.pipelines.detect import run_detect

    root, labels = _setup(tmp_path)
    out = tmp_path / "ck"
    _train(root, labels, out, steps=2)
    nusc = NuScenesTables(root, VERSION)
    scene = nusc.table("scene")[0]["name"]
    sub = run_detect(
        str(root), VERSION, str(out / "centerpoint"),
        str(tmp_path / "det.json"), scenes=[scene], batch_size=2, top_k=8,
        score_thresh=0.0, max_points=4096,
        pillar_cfg=PILLAR, model_cfg=MODEL, verbose=False,
    )
    expected = {s["token"] for s in nusc.iter_samples(nusc.scene_by_name(scene))}
    assert set(sub["results"]) == expected


def test_fusion_pretrain_then_detect(tmp_path):
    """BEVFusion-lite loop: pretrain --use_camera trains the camera+LiDAR
    model on the fixture's ring jpgs, detect --use_camera runs it back to a
    standard submission (the reference's BEVFusion table rows, in-framework)."""
    from cm3d_tpu.datasets.nuscenes.tables import NuScenesTables
    from cm3d_tpu.pipelines.detect import run_detect
    from cm3d_tpu.train.bevfusion import BevFusionConfig

    root, labels = _setup(tmp_path)
    out = tmp_path / "ckf"
    fusion = BevFusionConfig(centerpoint=MODEL, cam_channels=4,
                             cam_trunk=(4, 8), depth_bins=4,
                             d_min=1.0, d_max=25.0)
    hw = (48, 64)
    metrics = _train(root, labels, out, steps=3, use_camera=True,
                     image_hw=hw, fusion_cfg=fusion)
    assert np.isfinite(metrics["loss"])
    assert (out / "bevfusion").is_dir()

    sub = run_detect(
        str(root), VERSION, str(out / "bevfusion"),
        str(tmp_path / "detf.json"), batch_size=2, top_k=16,
        score_thresh=0.0, max_points=4096,
        pillar_cfg=PILLAR, verbose=False,
        use_camera=True, image_hw=hw, fusion_cfg=fusion,
    )
    nusc = NuScenesTables(root, VERSION)
    tokens = {s["token"] for s in nusc.table("sample")}
    assert set(sub["results"]) == tokens
    assert sum(len(v) for v in sub["results"].values()) > 0

    # --data_parallel 2 on BOTH fusion CLIs (shards the camera operands
    # too): checkpoint and submission must match single-device
    from cm3d_tpu.models.checkpoints import load_params

    _train(root, labels, tmp_path / "ckf_dp", steps=3, use_camera=True,
           image_hw=hw, fusion_cfg=fusion, data_parallel=2)
    a = load_params(str(out / "bevfusion"))
    b = load_params(str(tmp_path / "ckf_dp" / "bevfusion"))
    jax.tree.map(
        # GSPMD reduction order in the lift-splat segment sums jitters the
        # last float bit; 1e-4 rel still pins "same training trajectory"
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-3, atol=1e-5
        ),
        a, b,
    )
    dp = run_detect(
        str(root), VERSION, str(out / "bevfusion"),
        str(tmp_path / "detf_dp.json"), batch_size=2, top_k=16,
        score_thresh=0.0, max_points=4096,
        pillar_cfg=PILLAR, verbose=False,
        use_camera=True, image_hw=hw, fusion_cfg=fusion, data_parallel=2,
    )
    assert set(dp["results"]) == set(sub["results"])
    for tok, boxes in sub["results"].items():
        got = dp["results"][tok]
        assert len(got) == len(boxes)
        for ba, bb in zip(boxes, got):
            assert ba["detection_name"] == bb["detection_name"]
            np.testing.assert_allclose(ba["translation"], bb["translation"],
                                       rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(ba["detection_score"],
                                       bb["detection_score"], atol=1e-4)


def test_finetune_gt_split_warm_start(tmp_path):
    """Semi-sup fine-tune (reference protocol, index.html:246-334): pretrain
    on pseudo-labels, then --labels_gt --split --init_from warm-starts
    params+batch_stats from the checkpoint (fresh optimizer, step 0)."""
    from cm3d_tpu.models.checkpoints import load_params

    root, labels = _setup(tmp_path)
    _train(root, labels, tmp_path / "pre", steps=2)
    pre_ckpt = str(tmp_path / "pre" / "centerpoint")

    # steps=0 fine-tune: the saved checkpoint must BE the warm start
    _train(root, None, tmp_path / "ft0", steps=0, labels_gt=True,
           split="scene-0001", init_from=pre_ckpt)
    a = load_params(pre_ckpt)
    b = load_params(str(tmp_path / "ft0" / "centerpoint"))
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y)
        ),
        a, b,
    )

    # a real fine-tune on GT labels trains green
    m = _train(root, None, tmp_path / "ft", steps=2, labels_gt=True,
               split="scene-0001", init_from=pre_ckpt)
    assert np.isfinite(m["loss"])


def test_finetune_split_excludes_all_samples(tmp_path):
    """A split naming a scene absent from the loaded tables fails loudly
    AT SPLIT RESOLUTION (datasets.nuscenes.splits.validate_against_tables)
    instead of silently filtering every sample out and training on
    nothing."""
    import pytest

    root, _ = _setup(tmp_path)
    with pytest.raises(ValueError, match="not in the loaded tables"):
        _train(root, None, tmp_path / "x", labels_gt=True,
               split="scene-9999")


def test_label_source_validation(tmp_path):
    """Exactly one of labels_json / labels_gt; resume and init_from are
    mutually exclusive."""
    import pytest

    root, labels = _setup(tmp_path)
    with pytest.raises(SystemExit, match="exactly one label source"):
        _train(root, None, tmp_path / "x")
    with pytest.raises(SystemExit, match="exactly one label source"):
        _train(root, labels, tmp_path / "x", labels_gt=True)
    with pytest.raises(SystemExit, match="mutually exclusive"):
        _train(root, labels, tmp_path / "x", resume=True,
               init_from=str(tmp_path / "nowhere"))


def test_build_gt_labels_matches_annotations(tmp_path):
    """GT label extraction: every fixture sample gets its mapped
    annotations (translation/rotation/size/name) in results-dict form."""
    from cm3d_tpu.datasets.nuscenes.tables import NuScenesTables
    from cm3d_tpu.eval.config import CATEGORY_TO_DETECTION_NAME
    from cm3d_tpu.pipelines.pretrain import build_gt_labels

    root, _ = _setup(tmp_path)
    nusc = NuScenesTables(root, VERSION)
    results = build_gt_labels(str(root), VERSION, tables=nusc)
    samples = nusc.table("sample")
    assert set(results) == {s["token"] for s in samples}
    for s in samples:
        expect = [
            a for a in (nusc.get("sample_annotation", t) for t in s["anns"])
            if a["category_name"] in CATEGORY_TO_DETECTION_NAME
        ]
        got = results[s["token"]]
        assert len(got) == len(expect)
        for o, a in zip(got, expect):
            assert o["detection_name"] == CATEGORY_TO_DETECTION_NAME[
                a["category_name"]]
            np.testing.assert_allclose(o["translation"], a["translation"])
            np.testing.assert_allclose(o["size"], a["size"])


def test_pretrain_recipe_flags_and_ema_deploy(tmp_path):
    """--lr_schedule/--warmup/--grad_clip/--ema_decay/--augment through
    run_pretrain: trains green, the deploy checkpoint is the EMA (differs
    from a no-EMA run of the same seed), and save_every/resume round-trips
    the EMA leaf through orbax."""
    from cm3d_tpu.models.checkpoints import load_params

    root, labels = _setup(tmp_path)
    kw = dict(steps=4, lr_schedule="cosine", warmup_steps=1, grad_clip=1.0,
              augment=True)
    m = _train(root, labels, tmp_path / "ema", ema_decay=0.9,
               save_every=2, **kw)
    assert np.isfinite(m["loss"])
    m2 = _train(root, labels, tmp_path / "raw", **kw)
    assert np.isfinite(m2["loss"])

    a = load_params(str(tmp_path / "ema" / "centerpoint"))
    b = load_params(str(tmp_path / "raw" / "centerpoint"))
    diffs = jax.tree_util.tree_leaves(jax.tree.map(
        lambda x, y: float(np.abs(np.asarray(x) - np.asarray(y)).max()),
        a["params"], b["params"]))
    assert max(diffs) > 0  # EMA deploy != raw final params

    # kill-and-restart with EMA on: resumed run equals uninterrupted
    _train(root, labels, tmp_path / "ema2", ema_decay=0.9, save_every=2,
           **{**kw, "steps": 2})
    _train(root, labels, tmp_path / "ema2", ema_decay=0.9, save_every=2,
           resume=True, **kw)
    c = load_params(str(tmp_path / "ema2" / "centerpoint"))
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-7),
        a, c,
    )


def test_build_train_batches_caps_keep_mapped_high_scores(tmp_path):
    """Unmapped detection_names must not consume box slots, and when
    max_boxes binds the HIGHEST-scoring mapped labels survive (review
    finding, session 11: the raw objs[:max_boxes] slice let skipped
    entries eat slots and kept arbitrary-order labels)."""
    from cm3d_tpu.pipelines.pretrain import build_train_batches

    root, labels = _setup(tmp_path)
    with open(labels) as f:
        results = json.load(f)["results"]
    token = next(iter(results))
    tpl = results[token][0]

    def mk(name, score):
        o = dict(tpl)
        o["detection_name"] = name
        o["detection_score"] = score
        # width encodes the score so the kept set is assertable from the
        # box array (scores themselves are not stored in it)
        o["size"] = [score * 10.0, 4.5, 1.4]
        return o

    # 4 unmapped names first, then 4 mapped cars with ascending scores;
    # max_boxes=2 must keep the TWO highest-scoring mapped ones
    results = {token: (
        [mk("not_a_class", 0.99)] * 4
        + [mk("car", s) for s in (0.1, 0.4, 0.2, 0.8)]
    )}
    rows = list(build_train_batches(
        str(root), VERSION, max_boxes=2, results=results,
    ))
    assert len(rows) == 1
    _, _points, _n, boxes, bvalid = rows[0]
    assert bvalid.sum() == 2  # both slots used by MAPPED labels
    kept_w = sorted(float(w) for w in boxes[bvalid][:, 3])
    np.testing.assert_allclose(kept_w, [4.0, 8.0], rtol=1e-6)
