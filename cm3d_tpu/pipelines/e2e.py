"""Fused pseudo-label pipeline: images -> masks -> 3D boxes in ONE process.

The reference is two CLIs glued by an on-disk artifact store
(gen_2d_masks_detic.py writes {frame}_data.json + {frame}_masks.pkl,
2d_to_3d.py reads them back — SURVEY.md §1 "layer boundaries are files on
disk"). That contract still exists here (pipelines.masks +
pipelines.lift), but because the mask stage's device postprocess already
emits the lift's bit-plane format (ops.maskpack), the two stages also fuse
directly: the SAM decode's [W, H, Mw] planes drop into the Keyframe
untouched — no RLE encode, no pickle, no decode-back. One process, one
device, pseudo-labels out.

Optionally still writes the reference-layout artifacts (--mask_dir) so the
two-stage contract (resume, parity testing) is preserved.

Usage:
  python -m cm3d_tpu.pipelines.e2e --dataroot D --version v1.0-mini \
      --scenes scene-0061 --out preds.json --fake_weights
"""

from __future__ import annotations

import argparse
import os
import time
from typing import List, Optional

import numpy as np

import dataclasses

from cm3d_tpu.config import LiftStageConfig, MaskStageConfig
from cm3d_tpu.utils.observability import MaskCounters


def _scale_ratio_for_thumbnail(lift_cfg: LiftStageConfig,
                               thumbnail: int) -> LiftStageConfig:
    """The reference's intrinsics ratios are calibrated for 1024-wide
    thumbnails (0.64 = 1024/1600 nuScenes, 1024/1920 Waymo, 0.8366 ≈
    1024/1224 KITTI). The fused mask canvas tracks the actual thumbnail
    size, so any other --thumbnail must rescale the ratio with it or
    projected points land off the masks (silent misprojection)."""
    if thumbnail == 1024:
        return lift_cfg
    return dataclasses.replace(
        lift_cfg, image_ratio=lift_cfg.image_ratio * (thumbnail / 1024.0)
    )
from cm3d_tpu.parallel import make_keyframe_step_fn
from cm3d_tpu.pipelines.masks import (
    MaskModels,
    start_frame_masks,
    write_frame_artifacts,
)


def run_fused(
    models: MaskModels,
    step,
    frames,
    mask_cfg: MaskStageConfig,
    on_boxes,
    batch_size: int = 4,
    counters=None,
    mask_wh: Optional[tuple] = None,
) -> int:
    """The fused images->masks->boxes core loop (shared by the nuScenes CLI
    path below and cm3d_tpu.benchmarks.bench_e2e, so the benchmark measures
    the real code path).

    Three-way overlap, mirroring run_mask_stage (the reference runs its two
    stages strictly sequentially from disk): a 2-deep IO thread pulls the
    frame source and runs prepare() (canvas assembly + the ~10 MB u8 upload
    rides under the previous frame's device compute), the main thread keeps
    the device queue fed (start_frame_masks per frame, lift step per batch),
    and a finisher thread downloads each batch's boxes (np.asarray releases
    the GIL during the device->host transfer) and runs on_boxes.

    frames: iterable of (images, assemble) where assemble(handle) returns
        (Keyframe, token) — or None to skip the frame. handle is the
        start_frame_masks result; assemble is called for EVERY frame, in
        source order, on the main thread — including frames whose "planes"
        is None (zero detections) — so artifact writes and scene-completion
        bookkeeping can live inside it without racing the IO prefetch.
        The iterable is consumed from the IO thread (it is the sole
        consumer, so a generator is fine).
    on_boxes(token, boxes_slice): consume one keyframe's lift outputs
        (numpy pytree, already sliced to this frame). Called from the
        finisher thread, one batch at a time, in order.
    mask_wh: fixed bit-plane canvas (w, h). REQUIRED whenever source
        image sizes can vary across frames (KITTI native sizes differ
        per frame): the default derives the canvas from each frame's
        thumbnailed images, and mismatched mask_bits shapes crash the
        keyframe stack (and each new geometry costs a full lift
        recompile). None is fine when the camera set is fixed
        (nuScenes/Waymo rings).
    Returns the number of keyframes that went through the lift step.
    """
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    import jax
    import jax.numpy as jnp

    if counters is None:  # count regardless; callers pass one to report it
        counters = MaskCounters()
    pending: list = []
    n_frames = 0
    it = iter(frames)

    def _stack(*xs):
        # device leaves (the mask bit-planes straight from the SAM decode)
        # stack ON DEVICE: np.stack would round-trip ~9 MB/frame through
        # the host only to upload it again for the lift step
        if isinstance(xs[0], jax.Array):
            return jnp.stack(xs)
        return np.stack(xs)

    def _deliver(entries, boxes):
        from cm3d_tpu.utils.fetch import device_fetch

        boxes_np = device_fetch(boxes)  # one batched transfer, not per-leaf
        for i, (_, token) in enumerate(entries):
            on_boxes(token, jax.tree.map(lambda x, i=i: x[i], boxes_np))

    def _pull():
        # runs on the single IO worker — the only consumer of `it`
        try:
            images, assemble = next(it)
        except StopIteration:
            return None
        return models.prepare(images), assemble

    with ThreadPoolExecutor(max_workers=1) as io_pool, \
            ThreadPoolExecutor(max_workers=1) as finish_pool:
        deliver_fut = None

        def flush():
            nonlocal pending, deliver_fut, n_frames
            if not pending:
                return
            entries, pending = pending, []
            kfs = [kf for kf, _ in entries]
            kfs += [kfs[-1]] * (batch_size - len(entries))
            batch = jax.tree.map(_stack, *kfs)
            _, boxes = step(batch)  # async dispatch
            n_frames += len(entries)
            # at most one delivery outstanding: ordering + bounded memory
            if deliver_fut is not None:
                deliver_fut.result()
            deliver_fut = finish_pool.submit(_deliver, entries, boxes)

        futs = deque()
        exhausted = False

        def _prefetch():
            nonlocal exhausted
            while not exhausted and len(futs) < 2:
                futs.append(io_pool.submit(_pull))
            return None

        _prefetch()
        while futs:
            res = futs.popleft().result()
            if res is None:
                exhausted = True
                continue
            _prefetch()
            prepared, assemble = res
            # 2D stage: planes stay in the lift's bit-plane layout
            handle = start_frame_masks(
                models, None, mask_cfg, mask_wh=mask_wh,
                plane_layout="xy", prepared=prepared,
            )
            # same truncation accounting as run_mask_stage — the fused
            # path must not silently drop what the two-stage path counts
            counters.update(handle["counts"])
            out = assemble(handle)
            if out is None:
                continue
            pending.append(out)
            if len(pending) >= batch_size:
                flush()
        flush()
        if deliver_fut is not None:
            deliver_fut.result()
    return n_frames


def run_e2e(
    dataroot: str,
    version: str,
    scenes: List[str],
    out_path: str,
    models: MaskModels,
    lift_cfg: LiftStageConfig = LiftStageConfig(),
    mask_cfg: MaskStageConfig = MaskStageConfig(),
    thumbnail: int = 1024,
    mask_dir: Optional[str] = None,
    batch_size: int = 4,
    verbose: bool = True,
    mask_wh: Optional[tuple] = None,
) -> dict:
    import jax
    from PIL import Image

    from cm3d_tpu.datasets.artifacts import MaskArtifactStore
    from cm3d_tpu.datasets.nuscenes import NuScenesFrontend, SubmissionWriter
    from cm3d_tpu.datasets.nuscenes.tables import CAM_LIST

    assert mask_cfg.max_masks_total == lift_cfg.max_masks, (
        "fused path requires the mask stage's bit-plane capacity to equal "
        "the lift's padded mask count"
    )
    lift_cfg = _scale_ratio_for_thumbnail(lift_cfg, thumbnail)
    store = MaskArtifactStore(mask_dir) if mask_dir else None
    # ONE fixed plane canvas for the frontend AND the fused mask stage
    # (run_fused mask_wh): per-frame canvases would change the keyframe
    # shape whenever image geometry varies
    plane_wh = mask_wh or (thumbnail, thumbnail * 9 // 16)
    frontend = NuScenesFrontend(
        dataroot, version, store, lift_cfg, mask_wh=plane_wh,
    )
    step = jax.jit(make_keyframe_step_fn(lift_cfg))
    writer = SubmissionWriter()
    t0 = time.perf_counter()

    def frame_source():
        for scene_name in scenes:
            scene = frontend.nusc.scene_by_name(scene_name)
            nmap = frontend._map_for_scene(scene)
            lane_points = nmap.all_lane_points(0.5)
            drivable = (
                frontend.drivable_for_scene(scene)
                if lift_cfg.drivable_filter else None
            )
            samples = list(frontend.nusc.iter_samples(scene))
            for frame_num, sample in enumerate(samples):
                images = []
                for cam in CAM_LIST:
                    sd = frontend.nusc.get("sample_data", sample["data"][cam])
                    im = Image.open(
                        f"{dataroot}/{sd['filename']}"
                    ).convert("RGB")
                    im.thumbnail((thumbnail, thumbnail))
                    images.append(np.asarray(im))
                # sweep aggregation (file reads + host transforms) runs
                # HERE — the generator body executes on run_fused's IO
                # worker — so the main thread's device-feed loop never
                # stalls on point IO (it only assembles)
                points = frontend.aggregate_sweeps(sample)

                def assemble(handle, scene_name=scene_name,
                             frame_num=frame_num, sample=sample,
                             points=points,
                             lane_points=lane_points, drivable=drivable,
                             n_total=len(samples)):
                    # assemble runs on the MAIN thread in frame order, so
                    # the write below for frame n_total-1 is the scene's
                    # last artifact write — marking completion here (not in
                    # the IO-prefetch generator, which runs frames ahead)
                    # keeps the resume manifest truthful under a mid-scene
                    # crash. Zero-detection frames still write (empty)
                    # artifacts, matching run_mask_stage. Writes go through
                    # the packed C encoder (masks.write_frame_artifacts),
                    # not the dense finish_frame_masks route.
                    if store is not None:  # optional reference artifacts
                        write_frame_artifacts(
                            store, scene_name, frame_num, handle
                        )
                        if frame_num == n_total - 1:
                            store.mark_scene_complete(scene_name, n_total)
                    if handle["planes"] is None:
                        return None
                    # planes stay a DEVICE array: the keyframe batch is
                    # stacked device-side in run_fused, so the bit-planes
                    # never round-trip through the host
                    packed = (handle["labels"], handle["scores"],
                              handle["cams"], handle["planes"])
                    kf, meta = frontend.assemble_keyframe(
                        scene_name, frame_num, sample, lane_points, packed,
                        drivable, points=points,
                    )
                    return kf, meta.sample_token

                yield images, assemble

    counters = MaskCounters()
    n_frames = run_fused(
        models, step, frame_source(), mask_cfg,
        writer.add_device_outputs, batch_size, counters=counters,
        mask_wh=plane_wh,
    )

    submission = writer.write(out_path)
    if verbose:
        dt = time.perf_counter() - t0
        n_boxes = sum(len(v) for v in submission["results"].values())
        print(f"e2e: {n_frames} keyframes -> {n_boxes} boxes in {dt:.1f}s "
              f"({n_frames / max(dt, 1e-9):.2f} kf/s)")
        print(counters.report())
    return submission


def run_e2e_waymo(
    frames_root: str,
    scenes: List[str],
    out_path: str,
    models: MaskModels,
    lift_cfg: Optional[LiftStageConfig] = None,
    mask_cfg: MaskStageConfig = MaskStageConfig(),
    thumbnail: int = 1024,
    mask_dir: Optional[str] = None,
    batch_size: int = 4,
    verbose: bool = True,
    mask_wh: Optional[tuple] = None,
) -> int:
    """Fused Waymo pipeline: raw .tfrecord segments (or frame-lite npz) ->
    images -> masks -> boxes -> metrics_pb2 Objects .bin, one process.

    The reference runs waymo/gen_2d_masks_detic.py then waymo/2d_to_3d.py
    glued by the artifact store; here the mask stage's device bit-planes
    drop straight into the Keyframe (same fusion as the nuScenes run_e2e).
    """
    import io

    import jax
    from PIL import Image

    from cm3d_tpu.config import WAYMO_LIFT
    from cm3d_tpu.datasets.artifacts import MaskArtifactStore
    from cm3d_tpu.datasets.waymo.frontend import (
        WaymoFrontend,
        boxes_to_waymo_objects,
    )
    from cm3d_tpu.datasets.waymo.proto import encode_objects

    if lift_cfg is None:
        lift_cfg = WAYMO_LIFT
    assert mask_cfg.max_masks_total == lift_cfg.max_masks, (
        "fused path requires the mask stage's bit-plane capacity to equal "
        "the lift's padded mask count"
    )
    lift_cfg = _scale_ratio_for_thumbnail(lift_cfg, thumbnail)
    store = MaskArtifactStore(mask_dir) if mask_dir else None
    frontend = WaymoFrontend(
        frames_root, store or MaskArtifactStore("/nonexistent"), lift_cfg,
        **({"mask_wh": mask_wh} if mask_wh else {}),
    )
    step = jax.jit(make_keyframe_step_fn(lift_cfg))
    all_objects: list = []
    t0 = time.perf_counter()

    def frame_source():
        for scene in scenes:
            n = frontend.num_frames(scene)
            for i in range(n):
                fr = frontend.load_frame_by_index(scene, i)
                images = []
                for buf in fr["cam_images_jpeg"]:
                    im = Image.open(io.BytesIO(bytes(buf))).convert("RGB")
                    im.thumbnail((thumbnail, thumbnail))
                    images.append(np.asarray(im))

                def assemble(handle, scene=scene, i=i, fr=fr, n=n):
                    # artifact write + completion marking happen here, on
                    # the main thread in frame order (see run_e2e: the IO
                    # generator runs frames ahead of the writes); writes go
                    # through the packed C encoder (write_frame_artifacts)
                    if store is not None:  # optional reference artifacts
                        write_frame_artifacts(store, scene, i, handle)
                        if i == n - 1:
                            store.mark_scene_complete(scene, n)
                    if handle["planes"] is None:
                        return None
                    packed = (handle["labels"], handle["scores"],
                              handle["cams"], handle["planes"])
                    built = frontend.build_keyframe(scene, i, fr, packed)
                    if built is None:
                        return None
                    kf, meta = built
                    return kf, meta

                yield images, assemble

    def on_boxes(meta, boxes):
        all_objects.extend(
            boxes_to_waymo_objects(
                meta, boxes.centers, boxes.sizes, boxes.yaws, boxes.scores,
                boxes.labels, boxes.keep,
            )
        )

    # NOTE: with mask_wh=None the plane canvas comes from the thumbnailed
    # image sizes inside run_fused (max over cameras — Waymo's front/side
    # cameras differ in height but the CAMERA SET is fixed, so the canvas
    # is identical every frame); the lift's in-image test reads the canvas
    # dims off the planes, so the fused path is self-consistent. An
    # explicit mask_wh pins the canvas for both the frontend and the
    # mask stage.
    counters = MaskCounters()
    n_frames = run_fused(
        models, step, frame_source(), mask_cfg, on_boxes, batch_size,
        counters=counters, mask_wh=mask_wh,
    )
    with open(out_path, "wb") as f:
        f.write(encode_objects(all_objects))
    if verbose:
        dt = time.perf_counter() - t0
        print(f"e2e waymo: {n_frames} keyframes -> {len(all_objects)} "
              f"objects in {dt:.1f}s ({n_frames / max(dt, 1e-9):.2f} kf/s)")
        print(counters.report())
    return n_frames


def run_e2e_kitti(
    root: str,
    indices: List[int],
    out_dir: str,
    models: MaskModels,
    lift_cfg: Optional[LiftStageConfig] = None,
    mask_cfg: MaskStageConfig = MaskStageConfig(),
    thumbnail: int = 1024,
    mask_dir: Optional[str] = None,
    batch_size: int = 4,
    verbose: bool = True,
) -> int:
    """Fused KITTI pipeline: image_2 -> masks -> boxes -> label txts, one
    process (the working version of the reference's two-script KITTI flow;
    its lifter dead-ends at kitti/2d_to_3d.py:1528)."""
    import jax
    from PIL import Image

    from cm3d_tpu.config import KITTI_LIFT
    from cm3d_tpu.datasets.artifacts import MaskArtifactStore
    from cm3d_tpu.datasets.kitti.calib import write_label
    from cm3d_tpu.datasets.kitti.frontend import (
        KittiFrontend,
        boxes_to_kitti_objects,
        kitti_image_wh,
    )
    from cm3d_tpu.pipelines.lift_kitti import make_kitti_step_fn
    import os

    if lift_cfg is None:
        lift_cfg = KITTI_LIFT
    assert mask_cfg.max_masks_total == lift_cfg.max_masks, (
        "fused path requires the mask stage's bit-plane capacity to equal "
        "the lift's padded mask count"
    )
    lift_cfg = _scale_ratio_for_thumbnail(lift_cfg, thumbnail)
    store = MaskArtifactStore(mask_dir) if mask_dir else None
    # KITTI native image sizes vary PER FRAME (1242x375 / 1224x370 /
    # 1238x374 / ...), so the bit-plane canvas must be pinned: a
    # per-frame canvas (run_fused's default) makes mask_bits shapes
    # differ across frames — the keyframe stack crashes and every new
    # geometry costs a full lift recompile. (1024, 320) is the two-stage
    # frontend default, scaled for non-1024 thumbnails.
    kitti_wh = (thumbnail, -(-320 * thumbnail // 1024))
    frontend = KittiFrontend(
        root, store or MaskArtifactStore("/nonexistent"), lift_cfg,
        mask_wh=kitti_wh,
    )
    kitti_step = jax.jit(make_kitti_step_fn(lift_cfg))

    # run_fused discards the first element of the step output and slices
    # the second per frame: pack (lift, keep) + per-mask score/label (the
    # KITTI writer needs them and the step output doesn't carry them)
    def step(batch):
        lift, keep = kitti_step(batch)
        return None, (lift, keep, batch.mask_score, batch.mask_label)

    os.makedirs(f"{out_dir}/pred", exist_ok=True)
    os.makedirs(f"{out_dir}/pseudo", exist_ok=True)
    n_boxes = 0
    t0 = time.perf_counter()

    def frame_source():
        for idx in indices:
            im = Image.open(
                frontend.dataset.get_image_path(idx)
            ).convert("RGB")
            im.thumbnail((thumbnail, thumbnail))
            images = [np.asarray(im)]

            def assemble(handle, idx=idx):
                if store is not None:
                    write_frame_artifacts(
                        store, frontend.scene_name, idx, handle
                    )
                    # no mark_scene_complete: `indices` may be an arbitrary
                    # subset of the split, so per-frame has_frame resume is
                    # the correct granularity here
                if handle["planes"] is None:
                    return None
                packed = (handle["labels"], handle["scores"],
                          handle["cams"], handle["planes"])
                built = frontend.build_keyframe(idx, packed)
                if built is None:
                    return None
                return built  # (kf, idx)

            yield images, assemble

    def on_boxes(idx, payload):
        nonlocal n_boxes
        lift, keep, scores, labels = payload
        calib = frontend.dataset.get_calibration(idx)
        objs = boxes_to_kitti_objects(
            calib, lift.centroids, lift.pca_yaws, scores, labels, keep,
            image_wh=kitti_image_wh(frontend.dataset, idx),
        )
        n_boxes += len(objs)
        write_label(f"{out_dir}/pred/{idx:06d}.txt", objs)
        pseudo = [
            type(o)(**{**o.__dict__, "score": float("nan")}) for o in objs
        ]
        write_label(f"{out_dir}/pseudo/{idx:06d}.txt", pseudo)

    counters = MaskCounters()
    n_frames = run_fused(
        models, step, frame_source(), mask_cfg, on_boxes, batch_size,
        counters=counters, mask_wh=kitti_wh,
    )
    if verbose:
        dt = time.perf_counter() - t0
        print(f"e2e kitti: {n_frames} frames -> {n_boxes} boxes in "
              f"{dt:.1f}s ({n_frames / max(dt, 1e-9):.2f} f/s)")
        print(counters.report())
    return n_frames


def merge_submissions(paths: List[str], out_path: str) -> dict:
    """Merge per-host submission JSONs (disjoint sample sets from
    --host_shard runs) into one. Duplicate sample tokens concatenate."""
    import json

    merged: dict = {"meta": None, "results": {}}
    for path in paths:
        with open(path) as f:
            sub = json.load(f)
        if merged["meta"] is None:
            merged["meta"] = sub.get("meta", {})
        for token, objs in sub["results"].items():
            merged["results"].setdefault(token, []).extend(objs)
    with open(out_path, "w") as f:
        json.dump(merged, f)
    return merged


def merge_host_outputs(paths: List[str], out: str,
                       dataset: str = "nuscenes") -> None:
    """Merge per-host --host_shard outputs into one, for any dataset.

    nuscenes: submission JSONs merge per sample token (merge_submissions).
    waymo: proto .bin shards concatenate byte-wise — Objects is a message
        with a single repeated field, and protobuf defines concatenation
        of serialized messages as message merging, so `cat` semantics are
        exact (the reference's metrics binary reads the result as one bin).
    kitti: per-host OUTPUT DIRECTORIES hold disjoint {frame:06d}.txt label
        files — either flat (the two-stage lift layout) or under pred/ and
        pseudo/ subdirectories (run_e2e_kitti's layout); merging mirrors
        the sublayout and copies files (duplicate frame ids raise — host
        shards must be disjoint).
    """
    if dataset == "nuscenes":
        merge_submissions(paths, out)
    elif dataset == "waymo":
        with open(out, "wb") as f:
            for path in paths:
                with open(path, "rb") as g:
                    f.write(g.read())
    elif dataset == "kitti":
        import shutil

        def _merge_dir(srcs, dst_dir):
            os.makedirs(dst_dir, exist_ok=True)
            for src in srcs:
                for name in sorted(os.listdir(src)):
                    s = os.path.join(src, name)
                    d = os.path.join(dst_dir, name)
                    if os.path.isdir(s):
                        # run_e2e_kitti sublayout: recurse into pred/pseudo
                        _merge_dir([s], d)
                        continue
                    if os.path.exists(d):
                        raise FileExistsError(
                            f"{d}: frame written by two host shards"
                        )
                    shutil.copyfile(s, d)

        _merge_dir(paths, out)
    else:
        raise ValueError(f"unknown dataset {dataset!r}")


def main(argv=None):
    p = argparse.ArgumentParser(
        description="CM3D-TPU fused images->masks->boxes pipeline"
    )
    p.add_argument("--dataset", default="nuscenes",
                   choices=["nuscenes", "waymo", "kitti"])
    p.add_argument("--dataroot", required=True)
    p.add_argument("--version", default="v1.0-mini")
    p.add_argument("--scenes", required=True, help="comma-separated names")
    p.add_argument("--out", default="pseudolabels.json")
    p.add_argument("--mask_dir", default="",
                   help="also write reference-layout mask artifacts here")
    p.add_argument("--thumbnail", type=int, default=1024)
    p.add_argument("--run_nms", type=int, default=-1,
                   help="class-wise 2D NMS before SAM prompting: 1 on / "
                   "0 off / -1 dataset default (off for kitti — the "
                   "reference's 'wo_2d_nms' — on otherwise; same contract "
                   "as the masks CLI)")
    p.add_argument("--fake_weights", action="store_true")
    p.add_argument("--detic_ckpt", default="")
    p.add_argument("--sam_ckpt", default="")
    p.add_argument("--clip_ckpt", default="")
    p.add_argument("--bpe_path", default="")
    p.add_argument("--rect_encode", action="store_true",
                   help="SAM rectangle encode (faster; small deviation)")
    p.add_argument("--quant_int8", action="store_true",
                   help="int8 w8a8 Dense layers in the SAM encoder AND "
                   "the 2D detector's Swin MLPs (Detic, or GroundingDINO "
                   "under --detector gdino; 2x MXU peak; documented "
                   "deviation for both models) — same flag as the masks "
                   "CLI")
    p.add_argument("--quant_static", action="store_true",
                   help="with --quant_int8: calibrated static SAM "
                   "activation scales, first-ring calibration (same flag "
                   "as the masks CLI)")
    p.add_argument("--sam_size", default="vit_h",
                   choices=["vit_h", "vit_l", "vit_b"],
                   help="SAM encoder scale matching --sam_ckpt (same flag "
                   "as the masks CLI)")
    p.add_argument("--detector", default="detic",
                   choices=("detic", "gdino"),
                   help="2D detector: detic (reference default) or the "
                   "GroundingDINO alternative (same flag as the masks CLI)")
    p.add_argument("--gdino_ckpt", default="",
                   help="groundingdino_swint_ogc torch checkpoint")
    p.add_argument("--gdino_vocab", default="",
                   help="bert-base-uncased vocab.txt for --detector gdino")
    p.add_argument("--gdino_bf16", action="store_true",
                   help="run GroundingDINO in bfloat16 compute (params "
                   "stay f32; softmax/score islands stay f32 in-module) "
                   "— the same speed/accuracy trade the Detic/SAM "
                   "production default makes; gdino stays f32 by "
                   "default for reference parity")
    p.add_argument("--camera_mesh", type=int, default=0,
                   help="camera-parallel 2D stage: shard the camera ring "
                   "over an N-chip data mesh (keyframe latency / N; N must "
                   "divide the ring size, e.g. 2/3/6 for nuScenes) — same "
                   "flag as the masks CLI")
    p.add_argument("--encode_chunk", type=int, default=1,
                   help="single-chip SAM encode batching: cameras per scan "
                   "step (must divide the ring size) — same flag as the "
                   "masks CLI")
    p.add_argument("--host_shard", action="store_true",
                   help="multi-host: keep only this process's scene stride "
                   "(same flag as the masks CLI); each host writes "
                   "{out}.host{i}, merge with pipelines.e2e."
                   "merge_host_outputs(paths, out, dataset)")
    args = p.parse_args(argv)

    from cm3d_tpu.pipelines.masks import (
        attach_gdino,
        build_fake_models,
        build_real_models,
    )
    from cm3d_tpu.vocab import (
        CUSTOM_VOCABULARY_NUSCENES,
        CUSTOM_VOCABULARY_WAYMO,
    )

    # same vocabulary switch as the masks CLI (the reference's Waymo
    # vocabulary drops cone/barrier, waymo/gen_2d_masks_detic.py:66-87)
    scene_list = args.scenes.split(",")
    out_path = args.out
    if args.host_shard:
        import jax

        from cm3d_tpu.parallel.multihost import shard_for_host

        scene_list = shard_for_host(scene_list)
        if jax.process_count() > 1:
            out_path = f"{args.out}.host{jax.process_index()}"

    vocab = (CUSTOM_VOCABULARY_WAYMO if args.dataset == "waymo"
             else CUSTOM_VOCABULARY_NUSCENES)
    mesh = None
    if args.camera_mesh:
        from cm3d_tpu.parallel import make_mesh

        mesh = make_mesh(n_data=args.camera_mesh, n_model=1)
    detic_used = args.detector == "detic"
    if args.fake_weights:
        models = build_fake_models(vocabulary=vocab,
                                   rect_encode=args.rect_encode, mesh=mesh,
                                   encode_chunk=args.encode_chunk,
                                   quant_int8=args.quant_int8,
                                   quant_static=args.quant_static,
                                   detic_used=detic_used)
    else:
        models = build_real_models(
            args.detic_ckpt, args.sam_ckpt, args.clip_ckpt, args.bpe_path,
            vocabulary=vocab, rect_encode=args.rect_encode, mesh=mesh,
            encode_chunk=args.encode_chunk, sam_size=args.sam_size,
            quant_int8=args.quant_int8, quant_static=args.quant_static,
            detic_used=detic_used,
        )
    if args.detector == "gdino":
        models = attach_gdino(
            models, args.gdino_ckpt, args.gdino_vocab,
            test=args.fake_weights, quant_int8=args.quant_int8,
            dtype="bfloat16" if args.gdino_bf16 else "float32",
        )
    # same default as the masks CLI: the reference's KITTI flow runs
    # without 2D NMS ("wo_2d_nms", kitti/gen_2d_masks_detic.py:781-811)
    run_nms = (
        (args.dataset != "kitti") if args.run_nms < 0 else bool(args.run_nms)
    )
    mask_cfg = MaskStageConfig(run_nms=run_nms)
    if args.dataset == "waymo":
        run_e2e_waymo(
            args.dataroot, scene_list, out_path, models, mask_cfg=mask_cfg,
            thumbnail=args.thumbnail, mask_dir=args.mask_dir or None,
        )
    elif args.dataset == "kitti":
        run_e2e_kitti(
            args.dataroot, [int(i) for i in scene_list],
            out_path, models, mask_cfg=mask_cfg, thumbnail=args.thumbnail,
            mask_dir=args.mask_dir or None,
        )
    else:
        run_e2e(
            args.dataroot, args.version, scene_list, out_path,
            models, mask_cfg=mask_cfg, thumbnail=args.thumbnail,
            mask_dir=args.mask_dir or None,
        )


if __name__ == "__main__":
    main()
