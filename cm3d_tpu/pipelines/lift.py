"""2D->3D lifting pipeline driver: mask artifacts -> submission JSON.

The TPU-native counterpart of the reference's src/nuscenes/2d_to_3d.py
__main__: iterate scenes, batch keyframes, run the jitted device step, write
the nuScenes submission. Differences by design:

- The reference's two passes + scene barrier (all-centroid lane assignment,
  2d_to_3d.py:699-706) are fused into the per-keyframe device step; scenes
  stream through in batches sharded over the data mesh.
- Resume: completed scenes tracked in the mask store manifest; corrupt
  frames skip-and-log instead of crashing.
- Stage timers keep the reference's taxonomy (io / device / write / total,
  reference :368-378) and report keyframes/sec — the BASELINE metric.

Usage:
  python -m cm3d_tpu.pipelines.lift --dataroot D --version v1.0-mini \
      --mask_dir MASKS --scenes scene-0061,scene-0103 --out preds.json
"""

from __future__ import annotations

import argparse
import json
import time
from typing import List

import numpy as np

from cm3d_tpu.config import LiftStageConfig
from cm3d_tpu.datasets.artifacts import MaskArtifactStore
from cm3d_tpu.datasets.types import stack_keyframes
from cm3d_tpu.parallel import make_keyframe_step_fn


def run_lift(
    dataroot: str,
    version: str,
    mask_dir: str,
    scenes: List[str],
    out_path: str,
    lift_cfg: LiftStageConfig = LiftStageConfig(),
    batch_size: int = 8,
    num_workers: int = 8,
    profile_dir: str | None = None,
    verbose: bool = True,
    resume: bool = False,
    data_parallel: int = 0,
) -> dict:
    import jax

    from cm3d_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    from cm3d_tpu.datasets.nuscenes import NuScenesFrontend, SubmissionWriter

    from cm3d_tpu.utils.observability import LiftCounters, StageTimer

    timer = StageTimer()
    counters = LiftCounters()
    t_total = time.perf_counter()

    store = MaskArtifactStore(mask_dir)
    frontend = NuScenesFrontend(dataroot, version, store, lift_cfg)
    from cm3d_tpu.parallel.pipeline import dp_step

    step = dp_step(make_keyframe_step_fn(lift_cfg), batch_size,
                   data_parallel)
    writer = SubmissionWriter()

    # Resume: samples already in the output file keep their boxes and are
    # not re-lifted; the rewrite is a superset merge, so a kill-and-restart
    # mid-run converges to the same submission (idempotent work units —
    # SURVEY.md §5 failure-detection row).
    done_tokens: set = set()
    import os as _os

    if resume and _os.path.exists(out_path):
        with open(out_path) as f:
            existing = json.load(f)
        writer.results.update(existing.get("results", {}))
        done_tokens = set(writer.results)

    n_frames = 0
    pending: list = []

    def flush():
        nonlocal pending
        if not pending:
            return
        t0 = time.perf_counter()
        n_real = len(pending)
        # pad the tail batch to the static batch size (single compilation)
        frames = [kf for kf, _ in pending]
        frames += [frames[-1]] * (batch_size - n_real)
        batch = stack_keyframes(frames)
        lift, boxes = step(batch.frames)
        from cm3d_tpu.utils.fetch import device_fetch

        boxes_np, lift_np = device_fetch((boxes, lift))  # one sync/transfer
        counters.update_from_outputs(
            np.asarray(batch.frames.mask_valid)[:n_real],
            jax.tree.map(lambda x: x[:n_real], lift_np),
            boxes_np.keep[:n_real],
        )
        timer.add("device", time.perf_counter() - t0)
        t0 = time.perf_counter()
        for i, (_, meta) in enumerate(pending[:n_real]):
            writer.add_device_outputs(
                meta.sample_token, jax.tree.map(lambda x: x[i], boxes_np)
            )
        timer.add("write", time.perf_counter() - t0)
        pending = []

    # Host keyframe building overlaps device execution: a worker pool
    # prefetches upcoming frames (the reference is strictly sequential —
    # SURVEY.md §2.4's "manual slice editing" is the closest it gets).
    from concurrent.futures import ThreadPoolExecutor

    def scene_frames(scene_name):
        scene = frontend.nusc.scene_by_name(scene_name)
        nmap = frontend._map_for_scene(scene)
        lane_points = nmap.all_lane_points(0.5)
        drivable = (
            frontend.drivable_for_scene(scene)
            if lift_cfg.drivable_filter
            else None
        )
        return [
            (scene_name, fn, sample, lane_points, drivable)
            for fn, sample in enumerate(frontend.nusc.iter_samples(scene))
            if sample["token"] not in done_tokens
        ]

    from cm3d_tpu.utils.observability import trace

    t0 = time.perf_counter()
    work = []
    for scene_name in scenes:
        work.extend(scene_frames(scene_name))
    profile_ctx = trace("lift", profile_dir)
    profile_ctx.__enter__()
    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        for built in pool.map(
            lambda a: frontend.build_keyframe(*a), work, chunksize=1
        ):
            if built is None:
                continue
            timer.add("io", time.perf_counter() - t0)
            pending.append(built)
            n_frames += 1
            if len(pending) >= batch_size:
                flush()
            t0 = time.perf_counter()
    timer.add("io", time.perf_counter() - t0)
    flush()
    profile_ctx.__exit__(None, None, None)

    t0 = time.perf_counter()
    submission = writer.write(out_path)
    timer.add("write", time.perf_counter() - t0)
    timer.add("total", time.perf_counter() - t_total)

    if verbose:
        n_boxes = sum(len(v) for v in submission["results"].values())
        print(f"wrote {len(submission['results'])} samples, {n_boxes} boxes.")
        total = timer.stages.get("total", 0.0)
        for op, v in timer.stages.items():
            print(f"{op} :\t\t {v:.3f}")
        if total > 0:
            print(f"keyframes/sec: {n_frames / total:.2f}")
        print(timer.report())
        print(counters.report())
    return submission


def main(argv=None):
    p = argparse.ArgumentParser(description="CM3D-TPU 2D->3D lifting stage")
    p.add_argument("--dataroot", required=True)
    p.add_argument("--version", default="v1.0-mini")
    p.add_argument("--mask_dir", required=True)
    p.add_argument("--scenes", default="",
                   help="comma-separated scene names; '' = all with artifacts")
    p.add_argument("--out", default="pseudolabels.json")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--data_parallel", type=int, default=0,
                   help="shard the keyframe batch over an N-chip data mesh "
                   "(N must divide --batch_size; 0 = single device)")
    p.add_argument("--resume", action="store_true",
                   help="keep samples already in --out; lift only the rest")
    p.add_argument("--host_shard", action="store_true",
                   help="multi-host: keep only this process's scene stride")
    p.add_argument("--profile", default="",
                   help="write a jax.profiler (Perfetto) trace to this dir")
    p.add_argument("--drivable_filter", action="store_true",
                   help="drop off-road car/truck/bus boxes (ref :774-779)")
    p.add_argument("--lane_dist_filter", action="store_true",
                   help="drop boxes far from lanes (ref :756-758,782-785)")
    p.add_argument("--dataset_priors", action="store_true",
                   help="dataset-mean shape priors instead of the chatgpt table")
    p.add_argument("--priors_file", default="",
                   help="get_priors JSON overriding the built-in prior tables")
    args = p.parse_args(argv)

    store = MaskArtifactStore(args.mask_dir)
    if args.scenes:
        scenes = args.scenes.split(",")
    else:
        scenes = sorted(store.completed_scenes())
    if args.host_shard:
        from cm3d_tpu.parallel.multihost import shard_for_host

        scenes = shard_for_host(scenes)
    if not scenes:
        raise SystemExit("no scenes to process (no --scenes and empty manifest)")
    import dataclasses

    lift_cfg = dataclasses.replace(
        LiftStageConfig(),
        drivable_filter=args.drivable_filter,
        lane_dist_filter=args.lane_dist_filter,
        use_chatgpt_priors=not args.dataset_priors,
        priors_file=args.priors_file or None,
    )
    run_lift(args.dataroot, args.version, args.mask_dir, scenes, args.out,
             lift_cfg=lift_cfg, batch_size=args.batch_size,
             profile_dir=args.profile or None, resume=args.resume,
             data_parallel=args.data_parallel)


if __name__ == "__main__":
    main()
