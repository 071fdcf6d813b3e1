"""Capstone integration: the ENTIRE framework chained in one process.

fabricated dataroot -> mask stage (fake-weight Detic+SAM) -> reference-layout
artifacts -> nuScenes frontend -> jitted lift -> submission writer ->
detection eval -> fusion with the planted-mask pseudo-labels.
"""

import json

import numpy as np
import pytest

from cm3d_tpu.config import LiftStageConfig, MaskStageConfig
from cm3d_tpu.datasets.artifacts import MaskArtifactStore
from nusc_fixture import VERSION, make_fake_nuscenes

SMALL = LiftStageConfig(
    max_points=16384, max_masks=32, max_points_per_mask=512,
    max_points_per_camera=8192, max_points_in_masks=2048,
    max_lane_points=1024,
)


def test_full_chain(tmp_path):
    import jax

    from cm3d_tpu.datasets.nuscenes import (
        NuScenesFrontend, SubmissionWriter, load_gt_for_eval,
    )
    from cm3d_tpu.datasets.nuscenes.tables import CAM_LIST, NuScenesTables
    from cm3d_tpu.datasets.types import stack_keyframes
    from cm3d_tpu.parallel import make_keyframe_step_fn
    from cm3d_tpu.pipelines.masks import build_fake_models, run_mask_stage

    root = tmp_path / "data"
    planted_masks = tmp_path / "planted"
    info = make_fake_nuscenes(root, planted_masks, n_frames=2, n_objects=6)

    # --- 2D stage with fake models over the fixture's jpgs ---
    from PIL import Image

    nusc = NuScenesTables(root, VERSION)
    scene = nusc.scene_by_name(info["scene_name"])
    samples = list(nusc.iter_samples(scene))

    def provider(scene_name, frame):
        images = []
        for cam in CAM_LIST:
            sd = nusc.get("sample_data", samples[frame]["data"][cam])
            im = Image.open(root / sd["filename"]).convert("RGB")
            im.thumbnail((128, 128))
            images.append(np.asarray(im))
        return images

    gen_masks = tmp_path / "genmasks"
    run_mask_stage(
        build_fake_models(), provider, [info["scene_name"]],
        lambda s: len(samples), str(gen_masks),
        MaskStageConfig(max_detections=16), verbose=False,
    )
    store = MaskArtifactStore(gen_masks)
    assert store.completed_scenes() == {info["scene_name"]}

    # --- 3D stage over the GENERATED artifacts (mechanical integrity) ---
    fe = NuScenesFrontend(root, VERSION, store, SMALL, mask_wh=(128, 96))
    kfs = list(fe.iter_scene(info["scene_name"]))
    assert len(kfs) == 2
    step = jax.jit(make_keyframe_step_fn(SMALL))
    batch = stack_keyframes([kf for kf, _ in kfs])
    lift, boxes = step(batch.frames)
    writer = SubmissionWriter()
    for i, (_, meta) in enumerate(kfs):
        writer.add_device_outputs(
            meta.sample_token, jax.tree.map(lambda x: np.asarray(x)[i], boxes)
        )
    sub_gen = writer.write(str(tmp_path / "gen.json"))

    # --- the planted-mask path produces a REAL submission; evaluate + fuse ---
    fe2 = NuScenesFrontend(root, VERSION, MaskArtifactStore(planted_masks),
                           SMALL)
    kfs2 = list(fe2.iter_scene(info["scene_name"]))
    batch2 = stack_keyframes([kf for kf, _ in kfs2])
    _, boxes2 = step(batch2.frames)
    writer2 = SubmissionWriter()
    for i, (_, meta) in enumerate(kfs2):
        writer2.add_device_outputs(
            meta.sample_token, jax.tree.map(lambda x: np.asarray(x)[i], boxes2)
        )
    writer2.write(str(tmp_path / "planted.json"))

    gt, egos, racks, _ = load_gt_for_eval(root, VERSION)
    json.dump(
        {"ego_translations": {k: list(v) for k, v in egos.items()},
         "boxes": gt.serialize()},
        open(tmp_path / "gt.json", "w"),
    )
    from cm3d_tpu.eval.__main__ import main as eval_main

    summary = eval_main([
        str(tmp_path / "planted.json"), "--gt_json", str(tmp_path / "gt.json"),
        "--output_dir", str(tmp_path / "metrics"), "--verbose", "0",
    ])
    assert summary["mean_ap"] > 0.1

    # fusion of the two submissions through the public pipeline
    from cm3d_tpu.pipelines.fusion import run_fusion_nuscenes

    n_gen = sum(len(v) for v in sub_gen["results"].values())
    if n_gen == 0:
        # the random-weight detector keeps no boxes at this scale: the
        # alpha search must fail LOUDLY (degenerate-extrema guard), not
        # sneak the 1e7/-1e7 sentinels through as a one-point grid
        with pytest.raises(SystemExit, match="degenerate confidence"):
            run_fusion_nuscenes(
                str(tmp_path / "planted.json"), str(tmp_path / "gen.json"),
                str(tmp_path / "gt.json"), str(tmp_path / "fused.json"),
                verbose=False,
            )
    else:
        # fusing in random-detector boxes must never beat nor break the eval
        best_alpha, best_score = run_fusion_nuscenes(
            str(tmp_path / "planted.json"), str(tmp_path / "gen.json"),
            str(tmp_path / "gt.json"), str(tmp_path / "fused.json"),
            verbose=False,
        )
        assert 0.0 <= best_score <= 1.0
        assert (tmp_path / "fused.json").exists()

    # exercise the REAL merge math end-to-end with a non-empty second
    # submission: the planted boxes score-halved. Hungarian matching pairs
    # every box with itself (IoU 1), so the merged geometry is identical
    # and the alpha search must recover (about) the planted submission's
    # mAP.
    sam3d = json.loads((tmp_path / "planted.json").read_text())
    for boxes in sam3d["results"].values():
        for b in boxes:
            b["detection_score"] = 0.5 * float(b["detection_score"])
    (tmp_path / "sam3d.json").write_text(json.dumps(sam3d))
    best_alpha, best_score = run_fusion_nuscenes(
        str(tmp_path / "planted.json"), str(tmp_path / "sam3d.json"),
        str(tmp_path / "gt.json"), str(tmp_path / "fused.json"),
        verbose=False,
    )
    assert best_score > 0.1  # same bar the planted submission cleared
    assert (tmp_path / "fused.json").exists()
