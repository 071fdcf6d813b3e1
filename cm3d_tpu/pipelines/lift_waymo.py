"""Waymo 2D->3D lifting driver: frame-lite + mask artifacts -> pred .bin.

Counterpart of src/waymo/2d_to_3d.py __main__ (:394-1305): same fused device
step as nuScenes, Waymo frontend semantics (single return, vehicle-frame
output boxes, NUSC_TO_WAYMO class mapping), serialized metrics_pb2.Objects.

Usage:
  python -m cm3d_tpu.pipelines.lift_waymo --frames_root F --mask_dir M \
      --out pred.bin [--scenes segment-...]
"""

from __future__ import annotations

import argparse
import time
from typing import List

import numpy as np

from cm3d_tpu.config import WAYMO_LIFT, LiftStageConfig
from cm3d_tpu.datasets.artifacts import MaskArtifactStore
from cm3d_tpu.datasets.types import stack_keyframes
from cm3d_tpu.parallel import make_keyframe_step_fn


def run_lift_waymo(
    frames_root: str,
    mask_dir: str,
    scenes: List[str],
    out_path: str,
    lift_cfg: LiftStageConfig = None,
    batch_size: int = 8,
    verbose: bool = True,
    data_parallel: int = 0,
) -> int:
    import jax

    from cm3d_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    if lift_cfg is None:
        lift_cfg = WAYMO_LIFT

    from cm3d_tpu.datasets.waymo.frontend import (
        WaymoFrontend,
        boxes_to_waymo_objects,
    )
    from cm3d_tpu.datasets.waymo.proto import encode_objects

    timer = {"io": 0.0, "device": 0.0, "write": 0.0, "total": 0.0}
    t_total = time.perf_counter()

    frontend = WaymoFrontend(frames_root, MaskArtifactStore(mask_dir), lift_cfg)
    from cm3d_tpu.parallel.pipeline import dp_step

    step = dp_step(make_keyframe_step_fn(lift_cfg), batch_size,
                   data_parallel)
    all_objects = []
    pending: list = []
    n_frames = 0

    def flush():
        nonlocal pending
        if not pending:
            return
        t0 = time.perf_counter()
        n_real = len(pending)
        frames = [kf for kf, _ in pending]
        frames += [frames[-1]] * (batch_size - n_real)
        batch = stack_keyframes(frames)
        _, boxes = step(batch.frames)
        from cm3d_tpu.utils.fetch import device_fetch

        boxes_np = device_fetch(boxes)  # one batched transfer
        timer["device"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        for i, (_, meta) in enumerate(pending[:n_real]):
            all_objects.extend(
                boxes_to_waymo_objects(
                    meta,
                    boxes_np.centers[i],
                    boxes_np.sizes[i],
                    boxes_np.yaws[i],
                    boxes_np.scores[i],
                    boxes_np.labels[i],
                    boxes_np.keep[i],
                )
            )
        timer["write"] += time.perf_counter() - t0
        pending = []

    for scene in scenes:
        t0 = time.perf_counter()
        for kf, meta in frontend.iter_scene(scene):
            timer["io"] += time.perf_counter() - t0
            pending.append((kf, meta))
            n_frames += 1
            if len(pending) >= batch_size:
                flush()
            t0 = time.perf_counter()
        timer["io"] += time.perf_counter() - t0
    flush()

    t0 = time.perf_counter()
    with open(out_path, "wb") as f:
        f.write(encode_objects(all_objects))
    timer["write"] += time.perf_counter() - t0
    timer["total"] = time.perf_counter() - t_total

    if verbose:
        print(f"wrote {len(all_objects)} objects from {n_frames} frames.")
        for op, v in timer.items():
            print(f"{op} :\t\t {v:.3f}")
    return len(all_objects)


def main(argv=None):
    p = argparse.ArgumentParser(description="CM3D-TPU Waymo lifting stage")
    p.add_argument("--frames_root", required=True)
    p.add_argument("--mask_dir", required=True)
    p.add_argument("--scenes", default="", help="comma-separated; '' = all")
    p.add_argument("--out", default="pred.bin")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--data_parallel", type=int, default=0,
                   help="shard the keyframe batch over an N-chip data "
                   "mesh (N must divide --batch_size)")
    args = p.parse_args(argv)

    from cm3d_tpu.datasets.waymo.frontend import WaymoFrontend

    store = MaskArtifactStore(args.mask_dir)
    fe = WaymoFrontend(args.frames_root, store)
    scenes = args.scenes.split(",") if args.scenes else fe.scene_names()
    run_lift_waymo(args.frames_root, args.mask_dir, scenes, args.out,
                   batch_size=args.batch_size,
                   data_parallel=args.data_parallel)


if __name__ == "__main__":
    main()
