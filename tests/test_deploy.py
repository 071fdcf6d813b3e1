"""AOT deployment artifacts (deploy.py): export → serialize → deserialize →
call must be bit-exact vs the in-process jit, with pytree structure
(framework NamedTuples) preserved across the serialization boundary."""

import numpy as np

from cm3d_tpu.config import LiftStageConfig

SMALL = LiftStageConfig(
    num_sweeps=1, max_points=2048, max_masks=16, max_points_per_mask=256,
    max_points_per_camera=1024, max_points_in_masks=512, max_lane_points=64,
)


def _small_batch(batch=2, seed=0):
    from cm3d_tpu.datasets.synthetic import SyntheticConfig, make_keyframe
    from cm3d_tpu.datasets.types import stack_keyframes

    rng = np.random.default_rng(seed)
    syn = SyntheticConfig(points_per_frame=1500, objects_per_frame=6)
    return stack_keyframes(
        [make_keyframe(syn, SMALL, rng) for _ in range(batch)]
    )


def test_lift_artifact_roundtrip(tmp_path):
    import jax

    from cm3d_tpu.deploy import export_lift_step, load_artifact, save_artifact
    from cm3d_tpu.parallel import make_keyframe_step_fn

    exported = export_lift_step(SMALL, batch_size=2)
    path = save_artifact(exported, tmp_path / "lift_b2.stablehlo")
    assert path.stat().st_size > 0

    loaded = load_artifact(path)
    batch = _small_batch()
    lift, boxes = loaded.call(batch.frames)
    ref_lift, ref_boxes = jax.jit(make_keyframe_step_fn(SMALL))(batch.frames)

    # NamedTuple structure survives the serialization boundary
    assert type(lift).__name__ == "LiftOutputs"
    assert type(boxes).__name__ == "BoxOutputs"
    for a, b in zip(lift, ref_lift):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(boxes, ref_boxes):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.asarray(boxes.keep).sum() > 0  # artifact does real work


def test_detect_artifact_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from cm3d_tpu.config import class_arrays
    from cm3d_tpu.deploy import (
        export_detect_step,
        load_artifact,
        save_artifact,
    )
    from cm3d_tpu.pipelines.detect import make_detect_fn
    from cm3d_tpu.train import CenterPointConfig, PillarConfig
    from cm3d_tpu.train.centerpoint import CenterPointDetector

    max_points = 512
    exported = export_detect_step(batch_size=1, max_points=max_points,
                                  top_k=16)
    path = save_artifact(exported, tmp_path / "detect_b1.stablehlo")
    loaded = load_artifact(path)

    # identical model/params built in-process (same seed as the exporter)
    pillar_cfg = PillarConfig()
    h, w = pillar_cfg.grid_hw
    model = CenterPointDetector(CenterPointConfig())
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, h, w, pillar_cfg.num_features)), train=True,
    )
    _, _, radii = class_arrays()
    detect = make_detect_fn(model, pillar_cfg,
                            radii[: model.cfg.num_classes], top_k=16)

    rng = np.random.default_rng(1)
    pts = np.zeros((1, max_points, 4), np.float32)
    pts[..., :3] = rng.uniform(-40, 40, (1, max_points, 3))
    valid = np.ones((1, max_points), bool)
    args = (variables["params"], variables.get("batch_stats", {}),
            jnp.asarray(pts), jnp.asarray(valid))
    got = loaded.call(*args)
    want = detect(*args)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_cli(tmp_path, capsys):
    from cm3d_tpu.deploy import load_artifact, main

    out = tmp_path / "artifact.stablehlo"
    # full-scale lift export is slow on CPU; drive the CLI through the
    # detect path at tiny max_points instead
    main(["--what", "detect", "--batch", "1", "--max_points", "256",
          "--top_k", "8", "--out", str(out)])
    assert "wrote" in capsys.readouterr().out
    loaded = load_artifact(out)
    assert len(loaded.in_avals) >= 4


def test_export_cli_rejects_inapplicable_flags(tmp_path):
    """Flags the selected artifact would silently ignore fail loud."""
    import pytest

    from cm3d_tpu.deploy import main

    out = str(tmp_path / "a.stablehlo")
    with pytest.raises(SystemExit):
        main(["--what", "lift", "--use_camera", "--out", out])
    with pytest.raises(SystemExit):
        main(["--what", "lift", "--max_points", "1024", "--out", out])
    with pytest.raises(SystemExit):
        main(["--what", "detect", "--dataset", "kitti", "--out", out])


def test_lift_export_dataset_preset():
    """export_lift_step traces the preset it is handed: the KITTI preset
    (num_sweeps=1) changes the padded point capacity vs the nuScenes
    default, so the artifact input avals must differ."""
    import dataclasses

    from cm3d_tpu.deploy import export_lift_step

    small_kitti = dataclasses.replace(
        SMALL, image_ratio=0.8366, sqrt_min_dist_load_filter=False)
    a = export_lift_step(SMALL, batch_size=1)
    b = export_lift_step(small_kitti, batch_size=1)
    assert [str(x) for x in a.in_avals] == [str(x) for x in b.in_avals]
    # differing capacity flows into the avals
    import dataclasses as dc
    c = export_lift_step(dc.replace(SMALL, max_points=1024), batch_size=1)
    assert [str(x) for x in a.in_avals] != [str(x) for x in c.in_avals]
