"""Trained-detector inference: CenterPoint checkpoint -> submission JSON.

Closes the semi-supervised loop behind BASELINE config 5: the reference
publishes mAP/NDS of detectors trained on CM3D pseudo-labels
(project page index.html:246-282) but ships no inference driver — training
and eval happen in external CenterPoint/BEVFusion repos. Here the loop is
in-framework: pseudo-labels (pipelines/lift.py or e2e.py) ->
pipelines/pretrain.py -> this module -> eval/__main__ scores the result
like any other submission.

Device path: pillarize -> detector forward -> CenterPoint top-k decode ->
circle NMS, all inside ONE jit (batched over samples, vmapped heads); the
host only aggregates sweeps and formats JSON.
"""

from __future__ import annotations

import argparse
import time
from typing import List, Optional

import numpy as np

from cm3d_tpu.config import NUSCENES_CLASSES, class_arrays


def make_detect_fn(model, pillar_cfg, radius_sq: np.ndarray,
                   top_k: int = 128, score_thresh: float = 0.1,
                   fusion: bool = False):
    """jitted (params, batch_stats, points [B,N,4], valid [B,N][, images,
    intrinsics, cam_to_ego]) -> (boxes [B,K,7], scores [B,K],
    classes [B,K], keep [B,K]). fusion=True expects a BevFusionDetector
    and the three camera operands (same layout as train.FusionBatch)."""
    import jax
    import jax.numpy as jnp

    from cm3d_tpu.ops.nms import circle_nms_keep
    from cm3d_tpu.train import decode_detections, pillarize

    radius_sq = jnp.asarray(radius_sq)
    out_stride = (model.cfg.centerpoint if fusion else model.cfg).out_stride

    @jax.jit
    def detect(params, batch_stats, points, valid, *camera):
        pillars = jax.vmap(lambda p, v: pillarize(p, v, pillar_cfg))(
            points, valid
        )
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            pillars, *camera, train=False,
        )

        def one(o):
            boxes, scores, classes = decode_detections(
                o, pillar_cfg, out_stride, top_k=top_k
            )
            good = scores >= score_thresh
            keep = circle_nms_keep(
                boxes[:, :2], scores, classes, good, radius_sq
            ) & good
            return boxes, scores, classes, keep

        return jax.vmap(one)(out)

    return detect


def run_detect(
    dataroot: str,
    version: str,
    ckpt_dir: str,
    out_json: str,
    scenes: Optional[List[str]] = None,
    batch_size: int = 4,
    top_k: int = 128,
    score_thresh: float = 0.1,
    max_points: int = 32768,
    pillar_cfg=None,
    model_cfg=None,
    classes=NUSCENES_CLASSES,
    verbose: bool = True,
    use_camera: bool = False,
    image_hw=(144, 256),
    fusion_cfg=None,
    camera_backbone: str = "conv",
    data_parallel: int = 0,
) -> dict:
    """Run the trained detector over keyframes; write + return the
    submission. `ckpt_dir` is pretrain's `{out}/centerpoint`
    (params + batch_stats) — or `{out}/bevfusion` with use_camera=True,
    which must match the training-time image_hw/fusion_cfg."""
    import jax
    import jax.numpy as jnp

    from cm3d_tpu.datasets.nuscenes.writer import SubmissionWriter, boxes_to_dicts
    from cm3d_tpu.models.checkpoints import load_params
    from cm3d_tpu.pipelines.pretrain import load_ego_points, make_points_frontend
    from cm3d_tpu.train import CenterPointConfig, PillarConfig
    from cm3d_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    pillar_cfg = pillar_cfg or PillarConfig()
    h, w = pillar_cfg.grid_hw
    if use_camera:
        from cm3d_tpu.train.bevfusion import BevFusionConfig, BevFusionDetector

        fusion_cfg = fusion_cfg or BevFusionConfig(
            centerpoint=model_cfg or CenterPointConfig(),
            camera_backbone=camera_backbone,
        )
        model_cfg = fusion_cfg.centerpoint
        model = BevFusionDetector(fusion_cfg, pillar_cfg)
        ih, iw = image_hw
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, h, w, pillar_cfg.num_features)),
            jnp.zeros((1, 6, ih, iw, 3)),
            jnp.tile(jnp.eye(3), (1, 6, 1, 1)),
            jnp.tile(jnp.eye(4), (1, 6, 1, 1)),
            train=True,
        )
    else:
        from cm3d_tpu.train.centerpoint import CenterPointDetector

        model_cfg = model_cfg or CenterPointConfig()
        model = CenterPointDetector(model_cfg)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, h, w, pillar_cfg.num_features)), train=True,
        )
    like = {"params": variables["params"],
            "batch_stats": variables.get("batch_stats", {})}
    restored = load_params(ckpt_dir, like=like)
    if data_parallel:
        # pure DP inference: params replicate, the keyframe batch shards
        from cm3d_tpu.parallel.mesh import dp_mesh, replicate, shard_batch

        mesh = dp_mesh(data_parallel, batch_size)
        params = replicate(restored["params"], mesh)
        batch_stats = replicate(restored["batch_stats"], mesh)

        def place_batch(x):
            return shard_batch(x, mesh)
    else:
        params = jax.device_put(restored["params"])
        batch_stats = jax.device_put(restored["batch_stats"])

        def place_batch(x):
            return x

    # CIRCLE_NMS_THRESH values are the squared thresholds the reference
    # compares squared distances against (ops/nms.circle_nms_keep doc)
    _, _, radii = class_arrays(classes)
    detect = make_detect_fn(model, pillar_cfg, radii[: model_cfg.num_classes],
                            top_k=top_k, score_thresh=score_thresh,
                            fusion=use_camera)

    fe = make_points_frontend(dataroot, version, max_points)
    nusc = fe.nusc
    if scenes:
        samples = []
        for name in scenes:
            samples += list(nusc.iter_samples(nusc.scene_by_name(name)))
    else:
        samples = list(nusc.table("sample"))

    writer = SubmissionWriter()
    t0 = time.perf_counter()
    for i0 in range(0, len(samples), batch_size):
        chunk = samples[i0 : i0 + batch_size]
        pts = np.zeros((batch_size, max_points, 4), np.float32)
        val = np.zeros((batch_size, max_points), bool)
        egos = []
        camera = []
        if use_camera:
            from cm3d_tpu.pipelines.pretrain import load_ring_cameras

            ih, iw = image_hw
            imgs = np.zeros((batch_size, 6, ih, iw, 3), np.float32)
            intr = np.tile(np.eye(3, dtype=np.float32), (batch_size, 6, 1, 1))
            exts = np.tile(np.eye(4, dtype=np.float32), (batch_size, 6, 1, 1))
        for j, sample in enumerate(chunk):
            # shared helper = the training frame, verbatim
            pts[j], val[j], ego_t = load_ego_points(fe, sample, max_points)
            egos.append(ego_t)
            if use_camera:
                im_u8, k, e = load_ring_cameras(fe, sample, image_hw, ego_t)
                imgs[j], intr[j], exts[j] = im_u8 / 255.0, k, e
        if use_camera:
            camera = [place_batch(jnp.asarray(imgs)),
                      place_batch(jnp.asarray(intr)),
                      place_batch(jnp.asarray(exts))]
        boxes, scores, cls, keep = jax.tree.map(
            np.asarray, detect(params, batch_stats,
                               place_batch(jnp.asarray(pts)),
                               place_batch(jnp.asarray(val)), *camera)
        )
        for j, sample in enumerate(chunk):
            centers = boxes[j, :, :3] + egos[j][None]  # back to global
            writer.add_sample(
                sample["token"],
                boxes_to_dicts(
                    sample["token"], centers, boxes[j, :, 3:6],
                    boxes[j, :, 6], scores[j], cls[j], keep[j],
                    classes=classes,
                ),
            )
    submission = writer.write(out_json)
    if verbose:
        dt = time.perf_counter() - t0
        n_boxes = sum(len(v) for v in submission["results"].values())
        print(f"detect: {len(samples)} keyframes, {n_boxes} boxes in "
              f"{dt:.1f}s -> {out_json}")
    return submission


def main(argv=None):
    p = argparse.ArgumentParser(
        description="trained-detector inference -> submission JSON"
    )
    p.add_argument("--dataroot", required=True)
    p.add_argument("--version", default="v1.0-mini")
    p.add_argument("--ckpt", required=True,
                   help="pretrain checkpoint dir ({out}/centerpoint)")
    p.add_argument("--out", default="detections.json")
    p.add_argument("--scenes", default="",
                   help="comma-separated scene names (default: all samples)")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--data_parallel", type=int, default=0,
                   help="shard the keyframe batch over an N-chip data "
                   "mesh (N must divide --batch_size)")
    p.add_argument("--top_k", type=int, default=128)
    p.add_argument("--score_thresh", type=float, default=0.1)
    p.add_argument("--use_camera", action="store_true",
                   help="BEVFusion-lite checkpoint ({out}/bevfusion from "
                   "pretrain --use_camera); loads the ring images too")
    p.add_argument("--camera_backbone", default="conv",
                   choices=("conv", "swin_t"),
                   help="--use_camera image backbone; must match the "
                   "checkpoint's training-time choice")
    p.add_argument("--image_hw", default="144x256",
                   help="camera input size HxW (must match training)")
    args = p.parse_args(argv)
    if args.camera_backbone != "conv" and not args.use_camera:
        raise SystemExit("--camera_backbone requires --use_camera")
    ih, iw = (int(x) for x in args.image_hw.split("x"))
    run_detect(
        args.dataroot, args.version, args.ckpt, args.out,
        scenes=args.scenes.split(",") if args.scenes else None,
        batch_size=args.batch_size, top_k=args.top_k,
        score_thresh=args.score_thresh, use_camera=args.use_camera,
        image_hw=(ih, iw), camera_backbone=args.camera_backbone,
        data_parallel=args.data_parallel,
    )


if __name__ == "__main__":
    main()
