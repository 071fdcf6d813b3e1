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
                   top_k: int = 128, score_thresh: float = 0.1):
    """jitted (params, batch_stats, points [B,N,4], valid [B,N]) ->
    (boxes [B,K,7], scores [B,K], classes [B,K], keep [B,K])."""
    import jax
    import jax.numpy as jnp

    from cm3d_tpu.ops.nms import circle_nms_keep
    from cm3d_tpu.train import decode_detections, pillarize

    radius_sq = jnp.asarray(radius_sq)

    @jax.jit
    def detect(params, batch_stats, points, valid):
        pillars = jax.vmap(lambda p, v: pillarize(p, v, pillar_cfg))(
            points, valid
        )
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            pillars, train=False,
        )

        def one(o):
            boxes, scores, classes = decode_detections(
                o, pillar_cfg, model.cfg.out_stride, top_k=top_k
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
) -> dict:
    """Run the trained detector over keyframes; write + return the
    submission. `ckpt_dir` is pretrain's `{out}/centerpoint`
    (params + batch_stats)."""
    import jax
    import jax.numpy as jnp

    from cm3d_tpu.datasets.nuscenes.writer import SubmissionWriter, boxes_to_dicts
    from cm3d_tpu.models.checkpoints import load_params
    from cm3d_tpu.pipelines.pretrain import load_ego_points, make_points_frontend
    from cm3d_tpu.train import CenterPointConfig, PillarConfig
    from cm3d_tpu.train.centerpoint import CenterPointDetector
    from cm3d_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    pillar_cfg = pillar_cfg or PillarConfig()
    model_cfg = model_cfg or CenterPointConfig()
    model = CenterPointDetector(model_cfg)
    h, w = pillar_cfg.grid_hw
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, h, w, pillar_cfg.num_features)), train=True,
    )
    like = {"params": variables["params"],
            "batch_stats": variables.get("batch_stats", {})}
    restored = load_params(ckpt_dir, like=like)
    params = jax.device_put(restored["params"])
    batch_stats = jax.device_put(restored["batch_stats"])

    # CIRCLE_NMS_THRESH values are the squared thresholds the reference
    # compares squared distances against (ops/nms.circle_nms_keep doc)
    _, _, radii = class_arrays(classes)
    detect = make_detect_fn(model, pillar_cfg, radii[: model_cfg.num_classes],
                            top_k=top_k, score_thresh=score_thresh)

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
        for j, sample in enumerate(chunk):
            # shared helper = the training frame, verbatim
            pts[j], val[j], ego_t = load_ego_points(fe, sample, max_points)
            egos.append(ego_t)
        boxes, scores, cls, keep = jax.tree.map(
            np.asarray, detect(params, batch_stats, jnp.asarray(pts),
                               jnp.asarray(val))
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
    p.add_argument("--top_k", type=int, default=128)
    p.add_argument("--score_thresh", type=float, default=0.1)
    args = p.parse_args(argv)
    run_detect(
        args.dataroot, args.version, args.ckpt, args.out,
        scenes=args.scenes.split(",") if args.scenes else None,
        batch_size=args.batch_size, top_k=args.top_k,
        score_thresh=args.score_thresh,
    )


if __name__ == "__main__":
    main()
