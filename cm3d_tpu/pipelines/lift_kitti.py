"""KITTI 2D->3D lifting driver: velodyne + mask artifacts -> label txts.

The working version of the reference's src/kitti/2d_to_3d.py (its main loop
dead-ends at a debug exit, :1528): lift masks to centroids with the shared
device step, BEV-PCA yaw, per-frame circle NMS, KITTI-format pred txt (with
scores) and pseudo-label txt (without, reference save_pred :879-885).

Usage:
  python -m cm3d_tpu.pipelines.lift_kitti --root KITTI --mask_dir M \
      --out_dir preds [--indices 0,1,2]
"""

from __future__ import annotations

import argparse
import os
import time
from typing import List

import numpy as np

from cm3d_tpu.config import KITTI_LIFT, LiftStageConfig, class_arrays
from cm3d_tpu.datasets.artifacts import MaskArtifactStore
from cm3d_tpu.datasets.kitti.calib import write_label
from cm3d_tpu.datasets.kitti.frontend import (
    KittiFrontend,
    boxes_to_kitti_objects,
    kitti_image_wh,
)
from cm3d_tpu.datasets.types import stack_keyframes


def make_kitti_step_fn(cfg: LiftStageConfig):
    """Lift + circle NMS, no lane/pushback stage (KITTI has no map)."""
    import jax
    import jax.numpy as jnp

    from cm3d_tpu.ops.lift import LiftParams, lift_keyframe
    from cm3d_tpu.ops.nms import circle_nms_keep

    _, _, radii_np = class_arrays()
    params = LiftParams(
        min_dist=cfg.min_dist,
        max_points_per_mask=cfg.max_points_per_mask,
        max_points_per_camera=cfg.max_points_per_camera,
        max_points_in_masks=cfg.max_points_in_masks,
        erode=cfg.erode_masks,
    )

    def one(frame):
        lift = lift_keyframe(
            frame.points, frame.point_valid,
            frame.cameras.ego_translation, frame.cameras.ego_rotation,
            frame.cameras.cam_translation, frame.cameras.cam_rotation,
            frame.cameras.intrinsics,
            frame.mask_bits, frame.mask_cam, frame.mask_valid, params,
        )
        keep = circle_nms_keep(
            lift.centroids[:, :2], frame.mask_score, frame.mask_label,
            lift.has_points, jnp.asarray(radii_np),
        )
        return lift, keep & lift.has_points

    return jax.vmap(one)


def run_lift_kitti(
    root: str,
    mask_dir: str,
    indices: List[int],
    out_dir: str,
    lift_cfg: LiftStageConfig = None,
    batch_size: int = 8,
    verbose: bool = True,
    data_parallel: int = 0,
    split: str = "training",
) -> int:
    import jax

    from cm3d_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    if lift_cfg is None:
        lift_cfg = KITTI_LIFT
    frontend = KittiFrontend(root, MaskArtifactStore(mask_dir), lift_cfg,
                             split=split)
    from cm3d_tpu.parallel.pipeline import dp_step

    step = dp_step(make_kitti_step_fn(lift_cfg), batch_size, data_parallel)
    os.makedirs(f"{out_dir}/pred", exist_ok=True)
    os.makedirs(f"{out_dir}/pseudo", exist_ok=True)

    pending = []
    n_boxes = 0
    t0 = time.perf_counter()

    def flush():
        nonlocal pending, n_boxes
        if not pending:
            return
        n_real = len(pending)
        frames = [kf for kf, _ in pending] + [pending[-1][0]] * (
            batch_size - len(pending)
        )
        batch = stack_keyframes(frames)
        lift, keep = step(batch.frames)
        from cm3d_tpu.utils.fetch import device_fetch

        lift_np, keep_np = device_fetch((lift, keep))  # one transfer
        for i, (kf, idx) in enumerate(pending[:n_real]):
            calib = frontend.dataset.get_calibration(idx)
            objs = boxes_to_kitti_objects(
                calib,
                lift_np.centroids[i],
                lift_np.pca_yaws[i],
                np.asarray(batch.frames.mask_score)[i],
                np.asarray(batch.frames.mask_label)[i],
                keep_np[i],
                image_wh=kitti_image_wh(frontend.dataset, idx),
            )
            n_boxes += len(objs)
            write_label(f"{out_dir}/pred/{idx:06d}.txt", objs)
            pseudo = [
                type(o)(**{**o.__dict__, "score": float("nan")}) for o in objs
            ]
            write_label(f"{out_dir}/pseudo/{idx:06d}.txt", pseudo)
        pending = []

    for kf, idx in frontend.iter_frames(indices):
        pending.append((kf, idx))
        if len(pending) >= batch_size:
            flush()
    flush()
    if verbose:
        dt = time.perf_counter() - t0
        print(f"wrote {n_boxes} boxes for {len(indices)} frames in {dt:.1f}s")
    return n_boxes


def main(argv=None):
    p = argparse.ArgumentParser(description="CM3D-TPU KITTI lifting stage")
    p.add_argument("--root", required=True)
    p.add_argument("--mask_dir", required=True)
    p.add_argument("--split", default="training")
    p.add_argument("--indices", default="", help="comma-separated; '' = all")
    p.add_argument("--out_dir", default="kitti_preds")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--data_parallel", type=int, default=0,
                   help="shard the keyframe batch over an N-chip data "
                   "mesh (N must divide --batch_size)")
    args = p.parse_args(argv)

    store = MaskArtifactStore(args.mask_dir)
    if args.indices:
        indices = [int(i) for i in args.indices.split(",")]
    else:
        indices = store.frame_numbers("kitti")
    if not indices:
        raise SystemExit("no frames to process")
    run_lift_kitti(args.root, args.mask_dir, indices, args.out_dir,
                   batch_size=args.batch_size,
                   data_parallel=args.data_parallel,
                   split=args.split)


if __name__ == "__main__":
    main()
