"""Pseudo-label pretraining driver: submission JSON + nuScenes points ->
trained CenterPoint-style detector (BASELINE config 5, the stretch target).

Boxes come from a CM3D submission (or any nuScenes-format results JSON);
points come from the dataroot's keyframe sweeps, shifted into the ego frame
(training is ego-centric). Batches shard over the device mesh data axis.

Usage:
  python -m cm3d_tpu.pipelines.pretrain --dataroot D --version V \
      --labels preds.json --steps 200 --out ckpt_dir
"""

from __future__ import annotations

import argparse
import json
import time
from typing import Dict

import numpy as np

from cm3d_tpu.config import CLASS_TO_ID, LiftStageConfig


def build_train_batches(
    dataroot: str,
    version: str,
    labels_json: str,
    max_points: int = 32768,
    max_boxes: int = 64,
):
    """Yield (sample_token, points [N,4] ego, boxes [M,8], valids)."""
    from cm3d_tpu.datasets.artifacts import MaskArtifactStore
    from cm3d_tpu.datasets.nuscenes import NuScenesFrontend
    from cm3d_tpu.eval.algo import quaternion_yaw

    with open(labels_json) as f:
        results = json.load(f)["results"]

    # frontend only for sweep aggregation / tables (no masks needed)
    fe = NuScenesFrontend(
        dataroot, version, MaskArtifactStore("/nonexistent"),
        LiftStageConfig(max_points=max_points),
    )
    nusc = fe.nusc
    token_to_sample = {s["token"]: s for s in nusc.table("sample")}

    for token, objs in results.items():
        sample = token_to_sample.get(token)
        if sample is None:
            continue
        pose = nusc.sample_lidar_ego_pose(sample)
        ego_t = np.asarray(pose["translation"])
        pts = fe.aggregate_sweeps(sample)
        pts[:, :3] -= ego_t  # ego-centric training frame

        points = np.zeros((max_points, 4), np.float32)
        pvalid = np.zeros(max_points, bool)
        n = min(len(pts), max_points)
        points[:n] = pts[:n]
        pvalid[:n] = True

        boxes = np.zeros((max_boxes, 8), np.float32)
        bvalid = np.zeros(max_boxes, bool)
        for i, o in enumerate(objs[:max_boxes]):
            if o["detection_name"] not in CLASS_TO_ID:
                continue
            t = np.asarray(o["translation"]) - ego_t
            yaw = quaternion_yaw(tuple(o["rotation"]))
            w, l, h = o["size"]
            boxes[i] = [t[0], t[1], t[2], w, l, h, yaw,
                        CLASS_TO_ID[o["detection_name"]]]
            bvalid[i] = True
        yield token, points, pvalid, boxes, bvalid


def run_pretrain(
    dataroot: str,
    version: str,
    labels_json: str,
    out_dir: str,
    steps: int = 100,
    batch_size: int = 4,
    learning_rate: float = 1e-3,
    verbose: bool = True,
) -> Dict[str, float]:
    import jax
    import jax.numpy as jnp

    from cm3d_tpu.models.checkpoints import save_params
    from cm3d_tpu.train import CenterPointConfig, PillarConfig, make_train_step
    from cm3d_tpu.train.train import TrainBatch, init_state
    from cm3d_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    data = list(build_train_batches(dataroot, version, labels_json))
    if not data:
        raise SystemExit("no training samples (empty labels or token mismatch)")

    pillar_cfg = PillarConfig()
    model_cfg = CenterPointConfig()
    state, model, tx = init_state(
        jax.random.PRNGKey(0), pillar_cfg, model_cfg, learning_rate
    )
    step = jax.jit(make_train_step(model, tx, pillar_cfg))

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    last = {}
    for s in range(steps):
        pick = rng.integers(0, len(data), batch_size)
        batch = TrainBatch(
            points=jnp.asarray(np.stack([data[i][1] for i in pick])),
            point_valid=jnp.asarray(np.stack([data[i][2] for i in pick])),
            boxes=jnp.asarray(np.stack([data[i][3] for i in pick])),
            box_valid=jnp.asarray(np.stack([data[i][4] for i in pick])),
        )
        state, metrics = step(state, batch)
        last = {k: float(np.asarray(v)) for k, v in metrics.items()}
        if verbose and (s % max(1, steps // 10) == 0 or s == steps - 1):
            print(f"step {s}: " + json.dumps({k: round(v, 4) for k, v in last.items()}))
    if verbose:
        print(f"trained {steps} steps in {time.perf_counter() - t0:.1f}s")
    save_params(
        {"params": state.params, "batch_stats": state.batch_stats},
        f"{out_dir}/centerpoint",
    )
    if verbose:
        print(f"saved checkpoint to {out_dir}/centerpoint")
    return last


def main(argv=None):
    p = argparse.ArgumentParser(description="pseudo-label detector pretraining")
    p.add_argument("--dataroot", required=True)
    p.add_argument("--version", default="v1.0-mini")
    p.add_argument("--labels", required=True, help="submission JSON")
    p.add_argument("--out", default="pretrain_ckpt")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-3)
    args = p.parse_args(argv)
    run_pretrain(args.dataroot, args.version, args.labels, args.out,
                 args.steps, args.batch_size, args.lr)


if __name__ == "__main__":
    main()
