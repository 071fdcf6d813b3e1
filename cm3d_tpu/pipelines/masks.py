"""2D mask-generation pipeline: Detic -> class-wise NMS -> SAM -> artifacts.

The TPU-native counterpart of the reference's src/nuscenes/
gen_2d_masks_detic.py __main__ (:242-513): per camera image, run the
open-vocabulary detector with the custom vocabulary, map detector labels to
canonical classes (map_class), class-wise 2D NMS at IoU 0.75, box-prompt SAM
for instance masks, store masks transposed [W, H] as COCO RLE with
labels/scores/cam_nums JSON.

Model forwards are injected callables so the pipeline runs identically with
real converted checkpoints or tiny fake-weight models (hermetic CI). Static
shapes throughout: detections padded to max_detections, so each model
compiles once per image geometry.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time
from typing import Callable, List, Optional, Tuple

import numpy as np

from cm3d_tpu.config import MaskStageConfig
from cm3d_tpu.datasets.artifacts import FrameMasks, MaskArtifactStore
from cm3d_tpu.ops.bitmask import num_words, unpack_masks_np
from cm3d_tpu.vocab import CUSTOM_VOCABULARY_NUSCENES, map_class


@dataclasses.dataclass
class MaskModels:
    """Injected model callables — BATCHED over the camera ring (one device
    dispatch per keyframe per model, not one per camera; the reference loops
    cameras sequentially, gen_2d_masks_detic.py:277).

    prepare(images: list of per-camera RGB uint8) -> frame inputs: ONE
        uint8 upload shared by detector and segmenter (normalization happens
        on device — the f32 host image was 4x the transfer bytes).
    detic(frame) ->
        (boxes [C,D,4] xyxy image px, scores [C,D], class_ids [C,D], valid
        [C,D]) — device arrays, converted by the caller.
    sam_encode(frame) -> per-camera embeddings [C, ...] (device; dispatch
        is async, so it overlaps the detic host post-processing).
    sam_decode_planes(emb, boxes_img [C,P,4], n_boxes [C], cam_hw, mask_wh,
        num_words, layout="xy"|"yx") -> [W, H, num_words] (xy) or
        [H, W, num_words] (yx) uint32 bit-planes (device): decode +
        upsample + threshold + bit-pack fused in one jit
        (cm3d_tpu.ops.maskpack), ~9 MB off-device per keyframe. "xy" feeds
        the lift step; "yx" is sequential for the host COCO-RLE encoder.
    vocabulary: detector vocabulary strings (class_ids index this)
    """

    prepare: Callable
    detic: Callable
    sam_encode: Callable
    sam_decode_planes: Callable
    vocabulary: Tuple[str, ...] = CUSTOM_VOCABULARY_NUSCENES
    # optional ZoeDepth metric depth: image_u8 [H, W, 3] -> depth [H, W]
    # f32 meters (reference predict_depth, gen_2d_masks_detic.py:121-124);
    # consumed when MaskStageConfig.use_zoedepth is on
    predict_depth: Optional[Callable] = None


def classwise_nms_np(boxes, scores, labels, iou_thresh=0.75):
    """Host-side greedy class-wise NMS (reference :348-372 semantics).
    Returns indices kept, in descending score order per class iteration."""
    keep = []
    boxes = np.asarray(boxes, np.float64)
    for cls in sorted(set(labels)):
        idx = [i for i, l in enumerate(labels) if l == cls]
        idx = sorted(idx, key=lambda i: -scores[i])
        alive = set(idx)
        for a, i in enumerate(idx):
            if i not in alive:
                continue
            keep.append(i)
            x1, y1, x2, y2 = boxes[i]
            ai = max(x2 - x1, 0) * max(y2 - y1, 0)
            for j in idx[a + 1 :]:
                if j not in alive:
                    continue
                xx1, yy1 = max(x1, boxes[j][0]), max(y1, boxes[j][1])
                xx2, yy2 = min(x2, boxes[j][2]), min(y2, boxes[j][3])
                inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
                aj = max(boxes[j][2] - boxes[j][0], 0) * max(
                    boxes[j][3] - boxes[j][1], 0
                )
                if union := ai + aj - inter:
                    if inter / union > iou_thresh:
                        alive.discard(j)
    return keep


def start_frame_masks(
    models: MaskModels,
    images: List[np.ndarray],  # per-camera RGB uint8 (already thumbnailed)
    cfg: MaskStageConfig = MaskStageConfig(),
    mask_wh: Optional[Tuple[int, int]] = None,
    plane_layout: str = "yx",
    prepared: Optional[dict] = None,
) -> dict:
    """Run a keyframe through the LAST device dispatch (upload -> SAM encode
    -> Detic -> host NMS -> fused decode dispatch) and return a handle;
    `finish_frame_masks` downloads + unpacks the planes. The split keeps the
    device queue bubble-free across frames — frame N's decode is enqueued
    BEFORE frame N+1's encoder — while frame N's unpack + RLE writes and
    frame N+1's image IO run on the host under the device compute.

    `prepared` (models.prepare output) lets the driver run the canvas
    assembly + u8 upload on its prefetch thread a full frame early, so the
    ~10 MB tunnel transfer overlaps the previous frame's compute."""
    frame_inputs = prepared if prepared is not None else models.prepare(images)
    if images is None:
        images = frame_inputs["images"]
    cam_hw = tuple((im.shape[0], im.shape[1]) for im in images)
    plane_wh = mask_wh or (
        max(w for _, w in cam_hw), max(h for h, _ in cam_hw)
    )
    # Detic is dispatched FIRST: the host must sync on its boxes (for NMS +
    # prompts), and queueing it behind the 6-camera SAM encode blocked the
    # host for the whole encode too (~900 ms vs ~240 ms measured). With
    # detic ahead, the host is free during the encode to run NMS, dispatch
    # the decode, and prepare + upload the NEXT frame under the device
    # compute.
    det = models.detic(frame_inputs)  # async dispatch
    emb = models.sam_encode(frame_inputs)  # async dispatch
    depths = None
    if cfg.use_zoedepth and models.predict_depth is not None:
        # reference zoe branch (:412-414): one depth map per camera image.
        # Use the async dispatch half when available: results stay device
        # arrays here and are pulled host-side in masked_depth_images (on
        # the finisher thread), keeping this host path bubble-free.
        depth_fn = getattr(models.predict_depth, "dispatch",
                           models.predict_depth)
        depths = [depth_fn(im) for im in images]
    # ONE batched transfer: per-array np.asarray paid the ~28 ms tunnel
    # round trip per leaf (4 leaves = ~112 ms of main-thread block;
    # scripts/ab_download_batch.py)
    from cm3d_tpu.utils.fetch import device_fetch

    boxes_b, scores_b, cids_b, valid_b = device_fetch(list(det))
    n_cams = len(cam_hw)

    p = cfg.max_detections
    cap = cfg.max_masks_total
    nw = num_words(cap)
    prompts = np.zeros((n_cams, p, 4), np.float32)
    n_boxes = np.zeros(n_cams, np.int32)
    all_labels: List[str] = []
    all_scores: List[float] = []
    all_cams: List[int] = []
    total = 0
    counts = {
        "detections": 0, "nms_suppressed": 0,
        "dropped_max_detections": 0, "dropped_masks_total": 0,
        "masks_written": 0,
    }

    for cam_idx in range(n_cams):
        v = valid_b[cam_idx]
        boxes = boxes_b[cam_idx][v]
        scores = scores_b[cam_idx][v]
        class_ids = cids_b[cam_idx][v]
        counts["detections"] += len(boxes)
        if len(boxes) == 0:
            continue
        labels = [map_class(models.vocabulary[c].lower()) for c in class_ids]
        if cfg.run_nms:
            kept = classwise_nms_np(boxes, scores, labels, cfg.nms_iou)
            counts["nms_suppressed"] += len(boxes) - len(kept)
            boxes = boxes[kept]
            scores = scores[kept]
            labels = [labels[i] for i in kept]
        # detections past either static cap are DROPPED — count them
        # (silent loss in the reference-shaped round-2 code; SURVEY §5)
        k_cam = min(len(boxes), p)
        counts["dropped_max_detections"] += len(boxes) - k_cam
        k = min(k_cam, max(cap - total, 0))
        counts["dropped_masks_total"] += k_cam - k
        if k <= 0:
            continue
        if k < len(boxes):
            # when a cap binds, drop the LOWEST scores — the incoming
            # order is class-major (classwise_nms_np) or raw detector
            # order, so a plain [:k] cut would keep low-score boxes of
            # early classes over high-score boxes of late ones. Survivors
            # keep their original relative order (np.sort of the top-k
            # index set), so untruncated frames are bit-identical.
            top = np.sort(np.argsort(-scores, kind="stable")[:k])
            boxes = boxes[top]
            scores = scores[top]
            labels = [labels[i] for i in top]
        prompts[cam_idx, :k] = boxes[:k]
        n_boxes[cam_idx] = k
        all_labels.extend(labels[:k])
        all_scores.extend(float(s) for s in scores[:k])
        all_cams.extend([cam_idx] * k)
        total += k
    counts["masks_written"] = total

    planes = None
    if total:
        # smallest prompt bucket that fits the busiest camera (fewer padded
        # prompts through the decoder; one compile per bucket size)
        pmax = int(n_boxes.max())
        bucket = next((b for b in sorted(cfg.prompt_buckets) if b >= pmax), p)
        planes = models.sam_decode_planes(  # async dispatch
            emb, prompts[:, :bucket], n_boxes, cam_hw, plane_wh, nw,
            plane_layout,
        )
    return {
        "planes": planes, "total": total, "plane_wh": plane_wh,
        "layout": plane_layout,
        "labels": all_labels, "scores": all_scores, "cams": all_cams,
        "counts": counts, "depths": depths,
    }


def masked_depth_images(handle: dict) -> np.ndarray:
    """use_zoedepth payload: per-mask masked metric depth [M, H, W] f32
    (reference :445-451: `depth_image_arr * mask_alpha`). Depth maps are
    zero-padded to the plane size; masks crop them per instance."""
    plane_w, plane_h = handle["plane_wh"]
    depths = handle["depths"]
    if handle["planes"] is None or not handle["labels"]:
        return np.zeros((0, plane_h, plane_w), np.float32)
    planes = np.asarray(handle["planes"])
    if handle["layout"] == "yx":
        planes = np.ascontiguousarray(np.swapaxes(planes, 0, 1))
    dense = unpack_masks_np(planes, handle["total"])  # [M, W, H] bool
    pad = np.zeros((len(depths), plane_h, plane_w), np.float32)
    for c, dm in enumerate(depths):
        dm = np.asarray(dm, np.float32)  # device->host if dispatched async
        h, w = dm.shape
        pad[c, :h, :w] = dm
    cams = np.asarray(handle["cams"], np.int32)
    return np.swapaxes(dense, 1, 2).astype(np.float32) * pad[cams]


def finish_frame_masks(
    models: MaskModels,
    handle: dict,
    cfg: MaskStageConfig = MaskStageConfig(),
) -> FrameMasks:
    """Download + unpack the planes of a frame started by start_frame_masks."""
    plane_wh = handle["plane_wh"]
    if handle["planes"] is None:
        return FrameMasks(
            [], [], [], np.zeros((0, plane_wh[0], plane_wh[1]), np.uint8)
        )
    planes = np.asarray(handle["planes"])
    if handle["layout"] == "yx":
        planes = np.ascontiguousarray(np.swapaxes(planes, 0, 1))
    dense = unpack_masks_np(planes, handle["total"]).astype(np.uint8)
    return FrameMasks(handle["labels"], handle["scores"], handle["cams"], dense)


def write_frame_artifacts(store, scene: str, frame_num: int,
                          handle: dict) -> None:
    """Write one frame's mask artifacts straight from a start_frame_masks
    handle via the packed-plane C encoder — no dense [M, W, H]
    intermediate (unpack + per-mask rescan cost ~760 ms/keyframe vs ~6 ms).
    The ONE artifact-writing recipe: run_mask_stage's finisher thread and
    the fused pipelines' optional --mask_dir writes both call this, so the
    fused path can't regress onto the slow finish_frame_masks +
    write_frame route."""
    if handle.get("depths") is not None:
        # use_zoedepth: masked depth images replace the mask payload
        # (reference :484-486). Checked FIRST so a zero-detection frame
        # still writes the depth-mode payload type ([0, H, W] float32,
        # which masked_depth_images returns when planes is None) — a
        # mixed-payload scene would break read_frame_depths consumers.
        store.write_frame_depths(
            scene, frame_num, handle["labels"], handle["scores"],
            handle["cams"], masked_depth_images(handle),
        )
    elif handle["planes"] is None:
        store.write_frame_rles(
            scene, frame_num, handle["labels"], handle["scores"],
            handle["cams"], [],
        )
    else:
        from cm3d_tpu.ops import rle as rle_codec

        rles = rle_codec.encode_packed_many(
            np.asarray(handle["planes"]), handle["total"],
            layout=handle["layout"],
        )
        store.write_frame_rles(
            scene, frame_num, handle["labels"], handle["scores"],
            handle["cams"], rles,
        )


def generate_frame_masks(
    models: MaskModels,
    images: List[np.ndarray],
    cfg: MaskStageConfig = MaskStageConfig(),
    mask_wh: Optional[Tuple[int, int]] = None,
) -> FrameMasks:
    """One keyframe end to end: detect + segment the camera ring batched.

    Asks for "xy" planes: this path unpacks to dense [M, W, H] masks, which
    reads the lift-side layout zero-copy (the driver's "yx" default exists
    for the straight-to-RLE write path)."""
    return finish_frame_masks(
        models,
        start_frame_masks(models, images, cfg, mask_wh, plane_layout="xy"),
        cfg,
    )


def _logits_to_masks(logits: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    """Upsample SAM mask logits to the image size and threshold at 0
    (SamPredictor.postprocess semantics; SAM pads to square, so upsample to
    the longest side and crop)."""
    h, w = hw
    side = max(h, w)
    p, mh, mw = logits.shape
    ys = (np.arange(side) + 0.5) * mh / side - 0.5
    xs = (np.arange(side) + 0.5) * mw / side - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, mh - 1)
    y1 = np.clip(y0 + 1, 0, mh - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, mw - 1)
    x1 = np.clip(x0 + 1, 0, mw - 1)
    wy = np.clip(ys - y0, 0, 1)[None, :, None]
    wx = np.clip(xs - x0, 0, 1)[None, None, :]
    up = (
        logits[:, y0][:, :, x0] * (1 - wy) * (1 - wx)
        + logits[:, y0][:, :, x1] * (1 - wy) * wx
        + logits[:, y1][:, :, x0] * wy * (1 - wx)
        + logits[:, y1][:, :, x1] * wy * wx
    )
    return (up[:, :h, :w] > 0).astype(np.uint8)


def run_mask_stage(
    models: MaskModels,
    image_provider: Callable[[str, int], List[np.ndarray]],
    scenes: List[str],
    frames_per_scene: Callable[[str], int],
    out_dir: str,
    cfg: MaskStageConfig = MaskStageConfig(),
    resume: bool = True,
    verbose: bool = True,
    counters=None,
) -> None:
    """Drive the mask stage over scenes; writes reference-layout artifacts.

    image_provider(scene, frame) -> list of per-camera RGB uint8 arrays.
    counters: optional utils.observability.MaskCounters to accumulate into
    (one is created — and reported when verbose — otherwise).
    """
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    from cm3d_tpu.utils.observability import MaskCounters

    if counters is None:
        counters = MaskCounters()
    store = MaskArtifactStore(out_dir)
    todo = store.remaining_scenes(scenes) if resume else list(scenes)
    t0 = time.time()
    n_frames = 0

    frames_per = {scene: frames_per_scene(scene) for scene in todo}
    work = [
        (scene, f)
        for scene in todo
        for f in range(frames_per[scene])
        if not (resume and store.has_frame(scene, f))
    ]
    remaining = {scene: 0 for scene in todo}
    for scene, _ in work:
        remaining[scene] += 1

    def _maybe_complete(scene):
        if remaining[scene] == 0:
            store.mark_scene_complete(scene, frames_per[scene])
            if verbose:
                print(f"{scene}: {frames_per[scene]} frames done")

    for scene in todo:  # scenes fully present but never marked (mid-run kill)
        _maybe_complete(scene)

    # Three-way overlap (the reference is strictly sequential,
    # gen_2d_masks_detic.py:259-277): a 2-deep image-IO prefetch thread, the
    # device chewing frame N, and the host writing frame N-1's artifacts.
    pending = None  # (scene, f, handle)

    def _finish(entry):
        nonlocal n_frames
        scene, f, handle = entry
        write_frame_artifacts(store, scene, f, handle)
        counters.update(handle["counts"])
        remaining[scene] -= 1
        _maybe_complete(scene)
        n_frames += 1

    # finish (result download + unpack + RLE write) runs on its own worker:
    # np.asarray releases the GIL during the device->host transfer, so it
    # overlaps the main thread's next start_frame_masks. At most one finish
    # outstanding (ordering + bounded memory).
    with ThreadPoolExecutor(max_workers=1) as io_pool, \
            ThreadPoolExecutor(max_workers=1) as finish_pool:
        futs = deque()
        idx = 0
        finish_fut = None

        def _fetch_and_prepare(sf):
            # canvas assembly + u8 device_put on the IO thread: the upload
            # is enqueued a frame early and rides under device compute
            return models.prepare(image_provider(*sf))

        def _prefetch():
            nonlocal idx
            while idx < len(work) and len(futs) < 2:
                sf = work[idx]
                futs.append((sf, io_pool.submit(_fetch_and_prepare, sf)))
                idx += 1

        _prefetch()
        while futs:
            (scene, f), fut = futs.popleft()
            prepared = fut.result()
            _prefetch()
            handle = start_frame_masks(models, None, cfg, prepared=prepared)
            if pending is not None:
                if finish_fut is not None:
                    finish_fut.result()
                finish_fut = finish_pool.submit(_finish, pending)
            pending = (scene, f, handle)
        if finish_fut is not None:
            finish_fut.result()
        if pending is not None:
            _finish(pending)

    if verbose and n_frames:
        dt = time.time() - t0
        print(f"Took {dt:.1f} seconds for {n_frames} frames "
              f"({n_frames / dt:.2f} frames/sec).")
        print(counters.report())


# ---------------------------------------------------------------------------
# Model builders
# ---------------------------------------------------------------------------

def _batched_model_fns(detic_model, detic_params, classifier, sam_model,
                       sam_params, vocabulary, mesh=None,
                       encode_chunk: int = 1) -> MaskModels:
    """Wrap jitted batched callables around Detic + SAM Flax models.

    Shared by the real-checkpoint and fake-weight builders so the pipeline
    exercises identical code in CI and production.

    mesh: optional jax.sharding.Mesh with a "data" axis — CAMERA
    PARALLELISM for the 2D stage (SURVEY.md §2.4): the ring's camera axis
    shards over the mesh, so SAM encode / Detic / decode for different
    cameras run on different chips concurrently (keyframe latency divides
    by the data-axis size). The per-camera scans become group-scans with a
    width-data vmap inside (_scan_vmapped) — a plain lax.scan would
    serialize the cameras XLA should partition, a plain vmap would blow
    the per-chip working set past one camera whenever data < n_cams.
    Requires n_cams % mesh.shape["data"] == 0.

    encode_chunk: single-chip SAM-encode batching — the same group-scan
    runs chunks of this many cameras per step (1 = the pure scan, the
    measured production setting; scripts/ab_sam_batch.py is the on-chip
    A/B that decides whether >1 amortizes the elementwise/softmax islands
    enough to beat the extra per-step working set). Ignored under a mesh
    (the mesh data size IS the chunk).
    """
    import functools

    import jax
    import jax.numpy as jnp

    from cm3d_tpu.models.sam import preprocess_image
    from cm3d_tpu.ops.maskpack import make_plane_postprocess

    img_size = sam_model.cfg.img_size
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        cam_sharding = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        data_size = mesh.shape["data"]
    else:
        cam_sharding = repl = None
        data_size = max(1, int(encode_chunk))
    # Params MUST flow in as jit arguments (not closure captures): captured
    # concrete arrays get baked into the lowered program as constants —
    # gigabytes re-staged per compile and catastrophic dispatch time.
    detic_params = jax.device_put(detic_params, repl)
    sam_params = jax.device_put(sam_params, repl)
    classifier = jax.device_put(classifier, repl)

    def prepare(images):
        """One uint8 canvas upload for the whole camera ring."""
        hs = [im.shape[0] for im in images]
        ws = [im.shape[1] for im in images]
        hmax, wmax = max(hs), max(ws)
        if data_size > 1:
            assert len(images) % data_size == 0, (
                f"camera-parallel mask stage: ring size {len(images)} must "
                f"divide over the mesh data axis / encode chunk "
                f"({data_size})"
            )
        canvas = np.zeros((len(images), hmax, wmax, 3), np.uint8)
        for i, im in enumerate(images):
            canvas[i, : hs[i], : ws[i]] = im
        hw = np.stack([hs, ws], axis=1).astype(np.int32)
        # fast SAM path: provider already thumbnailed longest side to the
        # SAM input size, so the resize is the identity
        scale1 = (
            all(max(h, w) == img_size for h, w in zip(hs, ws))
            and hmax <= img_size and wmax <= img_size
        )
        return {
            "dev": jax.device_put(canvas, cam_sharding),
            "hw": jax.device_put(hw, cam_sharding),
            "images": images,
            "scale1": scale1,
        }

    def _norm_and_mask(img_u8, hw_c, mean, std):
        """u8 -> f32 normalized with the zero padding restored to exact 0
        (both reference preprocessors pad AFTER normalization)."""
        h, w = img_u8.shape[0], img_u8.shape[1]
        x = (img_u8.astype(jnp.float32) - mean) / std
        row = jnp.arange(h)[:, None] < hw_c[0]
        col = jnp.arange(w)[None, :] < hw_c[1]
        return x * (row & col)[..., None].astype(jnp.float32)

    from cm3d_tpu.models.detic import DETIC_PIXEL_MEAN, DETIC_PIXEL_STD
    from cm3d_tpu.models.sam import SAM_PIXEL_MEAN, SAM_PIXEL_STD

    @jax.jit
    def detic_batch(p, clf, x_u8, hw):
        h, w = x_u8.shape[1], x_u8.shape[2]
        ph = -(-h // 32) * 32
        pw = -(-w // 32) * 32

        def one(img, hw_c):
            # RGB straight through: the reference's BGR flip is undone by
            # DefaultPredictor (INPUT.FORMAT=RGB) before the network — see
            # models/detic.py DETIC_PIXEL_MEAN
            x = _norm_and_mask(
                img, hw_c,
                jnp.asarray(DETIC_PIXEL_MEAN), jnp.asarray(DETIC_PIXEL_STD),
            )
            x = jnp.pad(x, ((0, ph - h), (0, pw - w), (0, 0)))
            return detic_model.apply({"params": p}, x, clf, hw_c)

        det = jax.vmap(one)(x_u8, hw)
        return det.boxes, det.scores, det.classes, det.valid

    def detic(frame):
        return detic_batch(detic_params, classifier, frame["dev"], frame["hw"])

    def _enc_one_u8(p, x_u8, hw_c, h, w):
        x = _norm_and_mask(
            x_u8, hw_c,
            jnp.asarray(SAM_PIXEL_MEAN), jnp.asarray(SAM_PIXEL_STD),
        )
        if not sam_model.cfg.rect_encode:
            # SamPredictor semantics: encode the zero-padded square
            x = jnp.pad(x, ((0, img_size - h), (0, img_size - w), (0, 0)))
        e = sam_model.apply(
            {"params": p}, x[None], method=sam_model.encode_image
        )
        return e[0]

    def _scan_vmapped(f, *xs):
        """Ring map that preserves the per-chip working-set cap: scan over
        groups of `data_size` cameras with a width-`data_size` vmap inside.
        GSPMD spreads each group across the mesh data axis, so every chip
        still holds ONE camera's intermediates per scan step (the reason
        the single-device path scans at all) — a plain vmap would
        materialize n_cams/data_size cameras per chip whenever the mesh is
        smaller than the ring."""
        c = xs[0].shape[0]
        grouped = tuple(
            x.reshape((c // data_size, data_size) + x.shape[1:]) for x in xs
        )

        def body(carry, xg):
            return carry, jax.vmap(f)(*xg)

        _, ys = jax.lax.scan(body, 0, grouped)
        return ys.reshape((c,) + ys.shape[2:])

    # single chip: scan the camera ring (caps the encoder working set at
    # one camera). camera-parallel mesh: group-scan with a vmap inside —
    # the group axis shards over "data", one camera per chip per step.
    @jax.jit
    def enc_scan_u8(p, xs_u8, hw):
        h, w = xs_u8.shape[1], xs_u8.shape[2]

        def body(carry, x_hw):
            return carry, _enc_one_u8(p, x_hw[0], x_hw[1], h, w)

        _, es = jax.lax.scan(body, 0, (xs_u8, hw))
        return es

    @jax.jit
    def enc_group_u8(p, xs_u8, hw):
        h, w = xs_u8.shape[1], xs_u8.shape[2]
        return _scan_vmapped(
            lambda x_u8, hw_c: _enc_one_u8(p, x_u8, hw_c, h, w), xs_u8, hw
        )

    @jax.jit
    def enc_scan_f32(p, xs):
        def body(carry, x):
            e = sam_model.apply(
                {"params": p}, x[None], method=sam_model.encode_image
            )
            return carry, e[0]

        _, es = jax.lax.scan(body, 0, xs)
        return es

    @jax.jit
    def enc_group_f32(p, xs):
        return _scan_vmapped(
            lambda x: sam_model.apply(
                {"params": p}, x[None], method=sam_model.encode_image
            )[0],
            xs,
        )

    # quant_static (calibrated int8 activation scales, ops/quant.py):
    # the static encoder needs act_scale leaves that depend on the deploy
    # data distribution, so the FIRST ring calibrates lazily — one jitted
    # dynamic-twin encode sows per-layer absmax, bake_act_scales fills
    # the leaves, and every later ring runs the reduce-free static path.
    _needs_cal = bool(getattr(sam_model.cfg, "quant_static", False))

    def _calibrate_first_ring(frame):
        import dataclasses as _dc

        from cm3d_tpu.models.sam import Sam
        from cm3d_tpu.ops.quant import bake_act_scales

        nonlocal sam_params
        dyn = Sam(_dc.replace(sam_model.cfg, quant_static=False))

        @jax.jit
        def cal_run(p, xs):
            def body(c, x):
                _, st = dyn.apply(
                    {"params": p}, x[None], method=dyn.encode_image,
                    mutable=["intermediates"],
                )
                return c, st["intermediates"]

            _, sts = jax.lax.scan(body, 0, xs)
            # max over the ring (scan stacked a leading camera axis)
            return jax.tree.map(lambda a: jnp.max(a, axis=0), sts)

        xs = np.stack(
            [preprocess_image(im, img_size) for im in frame["images"]]
        )
        inter = jax.device_get(cal_run(sam_params, jax.device_put(xs)))
        sam_params = jax.device_put(
            bake_act_scales(sam_params, inter), repl
        )

    def sam_encode(frame):
        if _needs_cal and not getattr(sam_encode, "_calibrated", False):
            _calibrate_first_ring(frame)
            sam_encode._calibrated = True
        enc_u8 = enc_group_u8 if data_size > 1 else enc_scan_u8
        if frame["scale1"]:
            return enc_u8(sam_params, frame["dev"], frame["hw"])
        # general path: host resize to the SAM input square (PIL bilinear)
        x = np.stack(
            [preprocess_image(im, img_size) for im in frame["images"]]
        )
        x = jax.device_put(x, cam_sharding)
        enc_f32 = enc_group_f32 if data_size > 1 else enc_scan_f32
        return enc_f32(sam_params, x)

    @functools.lru_cache(maxsize=8)
    def _decode_planes_fn(cam_hw, mask_wh, nw, rect, layout):
        post = make_plane_postprocess(
            mask_wh, cam_hw, nw, rect=rect, layout=layout
        )
        # image px -> SAM-input px resize factor, static per camera geometry
        scales = np.array(
            [img_size / max(h, w) for h, w in cam_hw], np.float32
        ).reshape(-1, 1, 1)

        @jax.jit
        def run(p, emb, boxes, n_boxes):
            def dec_one(e, b):
                logits, _ = sam_model.apply(
                    {"params": p}, e, b, method=sam_model.decode_boxes
                )
                return logits

            sb = jnp.asarray(boxes) * scales
            if mesh is not None:
                # camera-parallel: group-scan (see _scan_vmapped) so the
                # mesh decodes data_size cameras concurrently while each
                # chip still holds ONE camera's 128-prompt decoder+upscale
                # intermediates (~0.5 GB) per step
                logits = _scan_vmapped(dec_one, emb, sb)
            else:
                # scan (not vmap) over cameras: caps the decoder+upscale
                # intermediates at one camera's 128 prompts (~0.5 GB)
                _, logits = jax.lax.scan(
                    lambda c, eb: (c, dec_one(*eb)), 0, (emb, sb)
                )
            return post(logits, jnp.asarray(n_boxes))

        return run

    def sam_decode_planes(emb, boxes, n_boxes, cam_hw, mask_wh, nw,
                          layout="xy"):
        # rect-encoded embeddings have a cropped (non-square) grid
        hw_grid = sam_model.cfg.embed_hw
        rect = tuple(emb.shape[1:3]) != (hw_grid, hw_grid)
        return _decode_planes_fn(
            tuple(cam_hw), tuple(mask_wh), int(nw), bool(rect), str(layout)
        )(sam_params, emb, boxes, n_boxes)

    return MaskModels(prepare, detic, sam_encode, sam_decode_planes,
                      tuple(vocabulary))


def load_converted(path: str, convert_fn):
    """Checkpoint dispatch for the model CLIs: a directory is an
    already-converted orbax tree (one-time scripts/convert_checkpoints.py
    run — the production load path, device-ready, no torch unpickle); a
    file is the released torch checkpoint, converted on the fly."""
    if os.path.isdir(path):
        from cm3d_tpu.models.checkpoints import load_params

        return load_params(path)
    return convert_fn(path)


def build_real_models(
    detic_ckpt: str,
    sam_ckpt: str,
    clip_ckpt: str,
    bpe_path: str,
    vocabulary=CUSTOM_VOCABULARY_NUSCENES,
    dtype: str = "bfloat16",
    rect_encode: bool = False,
    mesh=None,
    encode_chunk: int = 1,
    sam_size: str = "vit_h",
    quant_int8: bool = False,
    quant_static: bool = False,
    detic_used: bool = True,
) -> MaskModels:
    """Full-size models from released torch checkpoints, jitted batched.

    sam_size picks the SAM encoder scale (vit_h = the reference's
    sam_vit_h_4b8939.pth, gen_2d_masks_detic.py:112; vit_l / vit_b are the
    released smaller checkpoints — a documented speed/quality deviation)."""
    import jax.numpy as jnp

    from cm3d_tpu.models.clip_text import (
        SimpleTokenizer, convert_clip_text_params, embed_vocabulary,
    )
    from cm3d_tpu.models.convert_detic import (
        convert_detic_params, load_detic_checkpoint,
    )
    from cm3d_tpu.models.convert_sam import convert_sam_params, load_torch_state_dict
    from cm3d_tpu.models.detic import DETIC_SWINB, Detic
    from cm3d_tpu.models.sam import Sam, sam_config_for

    sam_base = sam_config_for(sam_size)
    detic_params = load_converted(
        detic_ckpt, lambda p: convert_detic_params(load_detic_checkpoint(p))
    )
    sam_params = load_converted(
        sam_ckpt,
        lambda p: convert_sam_params(load_torch_state_dict(p), sam_base),
    )
    clip_params = load_converted(
        clip_ckpt,
        lambda p: convert_clip_text_params(load_torch_state_dict(p)),
    )
    tokenizer = SimpleTokenizer.from_file(bpe_path)
    classifier = jnp.asarray(
        embed_vocabulary(clip_params, tokenizer, list(vocabulary))
    )

    from cm3d_tpu.models.detic import quantize_detic_params
    from cm3d_tpu.models.sam import quantize_sam_params
    from cm3d_tpu.ops.quant import is_quantized_tree, reconcile_quantization

    # pre-quantized deployment checkpoints (convert_checkpoints.py
    # --quant_int8) pass through; float trees transform; a quantized tree
    # without the flag is a hard error
    sam_params = reconcile_quantization(
        sam_params, quantize_sam_params, quant_int8, "SAM"
    )
    if detic_used:
        detic_params = reconcile_quantization(
            detic_params, quantize_detic_params, quant_int8, "Detic"
        )
        detic_quant = quant_int8
    else:
        # --detector gdino: attach_gdino replaces this Detic before any
        # frame runs, so neither quantize it (wasted transform + device
        # replication of a discarded tree) nor reject whatever form the
        # checkpoint is in (an int8-only deployment dir must stay usable);
        # the cfg just matches the loaded tree so the callable is coherent
        detic_quant = is_quantized_tree(detic_params)
    detic_cfg = dataclasses.replace(
        DETIC_SWINB, dtype=dtype,
        swin=dataclasses.replace(DETIC_SWINB.swin, dtype=dtype,
                                 quant_int8=detic_quant),
    )
    sam_cfg = dataclasses.replace(sam_base, dtype=dtype,
                                  rect_encode=rect_encode,
                                  quant_int8=quant_int8,
                                  quant_static=quant_static)
    return _batched_model_fns(
        Detic(detic_cfg), detic_params, classifier, Sam(sam_cfg), sam_params,
        vocabulary, mesh=mesh, encode_chunk=encode_chunk,
    )


def attach_zoedepth(
    models: MaskModels, ckpt_path: str = "", test: bool = False,
    flip_aug: bool = True, seed: int = 0,
) -> MaskModels:
    """Wire a ZoeDepth predict_depth into a MaskModels (the reference's
    commented-out `torch.hub.load("isl-org/ZoeDepth", ...)`,
    gen_2d_masks_detic.py:117). test=True builds the tiny random-weight
    ZOE_TEST model (hermetic CI)."""
    import jax

    from cm3d_tpu.models.convert_sam import load_torch_state_dict
    from cm3d_tpu.models.zoedepth import (
        ZOE_N, ZOE_TEST, ZoeDepthModel, convert_zoedepth_params,
        make_predict_depth,
    )

    if test:
        model = ZoeDepthModel(ZOE_TEST)
        h, w = ZOE_TEST.img_hw
        params = model.init(
            jax.random.PRNGKey(seed), np.zeros((1, h, w, 3), np.float32)
        )["params"]
    else:
        model = ZoeDepthModel(ZOE_N)
        params = load_converted(
            ckpt_path,
            lambda p: convert_zoedepth_params(load_torch_state_dict(p)),
        )
    return dataclasses.replace(
        models, predict_depth=make_predict_depth(model, params, flip_aug)
    )


def attach_gdino(
    models: MaskModels, ckpt_path: str = "", vocab_path: str = "",
    test: bool = False, box_threshold: float = 0.15, seed: int = 0,
    quant_int8: bool = False, fake_scale: str = "test",
    dtype: str = "float32",
) -> MaskModels:
    """Swap the detector for GroundingDINO (the reference's commented-out
    alternative, kitti/gen_2d_masks_detic.py:115-117,633,697-704): boxes
    come from grounding the class-list caption instead of Detic, then flow
    into the same SAM prompt path. test=True builds a random-weight model
    with a synthetic WordPiece vocab over the class list — fake_scale
    picks its size: "test" = the tiny GDINO_TEST (hermetic CI), "swint" =
    the full GDINO_SWINT geometry (production-FLOPs benching,
    scripts/bench_gdino.py); the real path needs the checkpoint +
    bert-base-uncased vocab.txt. quant_int8 mirrors the Detic boundary:
    the Swin backbone's MLPs go int8 w8a8 (BERT / fusion / decoder stay
    float)."""
    import dataclasses as _dc

    import jax

    from cm3d_tpu.models.convert_sam import load_torch_state_dict
    from cm3d_tpu.models.gdino import (
        GDINO_SWINT, GDINO_TEST, BertConfig, GroundingDino,
        WordPieceTokenizer, convert_gdino_params, make_gdino_detector,
    )

    vocabulary = models.vocabulary
    if test:
        if fake_scale not in ("test", "swint"):
            raise ValueError(f"fake_scale must be test|swint: {fake_scale}")
        base = GDINO_TEST if fake_scale == "test" else GDINO_SWINT
        words = sorted({
            w for cls in vocabulary for w in cls.lower().split()
        })
        vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, ".": 4}
        for w in words:
            vocab[w] = len(vocab)
        bert = _dc.replace(
            base.bert, vocab_size=max(64, len(vocab) + 8),
            pad_id=0, unk_id=1, cls_id=2, sep_id=3,
        )
        cfg = _dc.replace(
            base, bert=bert, dtype=dtype,
            # bf16 forces the UNFUSED Swin attention: the fused kernel's
            # bf16 full-graph compile faults the TPU worker even at the
            # chunk-3 envelope that f32 validates (fused B=1 ok / B=3
            # faults / unfused B=6 ok — TPU_QUEUE_r04.log 17:52-18:34)
            swin=_dc.replace(
                base.swin, dtype=dtype,
                fused_attn=False if dtype == "bfloat16" else
                base.swin.fused_attn,
            ),
        )
        tok = WordPieceTokenizer(vocab, bert)
        model = GroundingDino(cfg)
        h, w = cfg.img_hw
        L = cfg.max_text_len
        params = model.init(
            jax.random.PRNGKey(seed),
            np.zeros((1, h, w, 3), np.float32),
            np.zeros((1, L), np.int32), np.zeros((1, L), np.int32),
            np.ones((1, L, L), bool), np.ones((1, L), bool),
        )["params"]
    else:
        cfg = _dc.replace(
            GDINO_SWINT, dtype=dtype,
            swin=_dc.replace(
                GDINO_SWINT.swin, dtype=dtype,
                fused_attn=False if dtype == "bfloat16" else
                GDINO_SWINT.swin.fused_attn,
            ),
        )
        tok = WordPieceTokenizer.from_file(vocab_path, BertConfig())
        model = GroundingDino(cfg)
        params = load_converted(
            ckpt_path,
            lambda p: convert_gdino_params(load_torch_state_dict(p), cfg),
        )
    from cm3d_tpu.models.swin import quantize_swin_backbone
    from cm3d_tpu.ops.quant import reconcile_quantization

    params = reconcile_quantization(
        params, quantize_swin_backbone, quant_int8, "GroundingDINO"
    )
    if quant_int8:
        cfg = _dc.replace(cfg, swin=_dc.replace(cfg.swin, quant_int8=True))
        model = GroundingDino(cfg)
    detect = make_gdino_detector(
        model, params, tok, vocabulary, box_threshold=box_threshold
    )
    return dataclasses.replace(models, detic=detect)


def _nuscenes_provider(args):
    from PIL import Image

    from cm3d_tpu.datasets.nuscenes.tables import CAM_LIST, NuScenesTables

    nusc = NuScenesTables(args.dataroot, args.version)
    scene_names = (
        args.scenes.split(",") if args.scenes
        else [s["name"] for s in nusc.table("scene")]
    )
    samples = {
        n: list(nusc.iter_samples(nusc.scene_by_name(n))) for n in scene_names
    }

    def provider(scene, frame):
        images = []
        for cam in CAM_LIST:
            sd = nusc.get("sample_data", samples[scene][frame]["data"][cam])
            im = Image.open(f"{args.dataroot}/{sd['filename']}").convert("RGB")
            im.thumbnail((args.thumbnail, args.thumbnail))
            images.append(np.asarray(im))
        return images

    return provider, scene_names, lambda s: len(samples[s])


def _kitti_provider(args):
    """Single-camera image_2 variant (reference kitti/gen_2d_masks_detic.py;
    note its run_nms=False "wo_2d_nms" default)."""
    from PIL import Image

    from cm3d_tpu.datasets.kitti.frontend import KittiDataset

    ds = KittiDataset(args.dataroot)
    if args.scenes:
        indices = [int(i) for i in args.scenes.split(",")]
    else:
        indices = list(range(ds.num_samples))

    def provider(scene, frame):
        im = Image.open(ds.get_image_path(indices[frame])).convert("RGB")
        im.thumbnail((args.thumbnail, args.thumbnail))
        return [np.asarray(im)]

    return provider, ["kitti"], lambda s: len(indices)


def _waymo_provider(args):
    """Per-camera JPEGs from frame-lite npz OR raw .tfrecord segments
    (reference waymo/gen_2d_masks_detic.py decodes them from the Frame
    proto; raw ingestion here is TF-free via datasets.waymo.frame_proto)."""
    import io

    from PIL import Image

    from cm3d_tpu.datasets.waymo.frontend import WaymoFrontend
    from cm3d_tpu.datasets.artifacts import MaskArtifactStore

    fe = WaymoFrontend(args.dataroot, MaskArtifactStore("/nonexistent"))
    scene_names = args.scenes.split(",") if args.scenes else fe.scene_names()

    def provider(scene, frame):
        fr = fe.load_frame_by_index(scene, frame, want_pose=False)
        images = []
        for buf in fr["cam_images_jpeg"]:
            im = Image.open(io.BytesIO(bytes(buf))).convert("RGB")
            im.thumbnail((args.thumbnail, args.thumbnail))
            images.append(np.asarray(im))
        return images

    return provider, scene_names, lambda s: fe.num_frames(s)


def main(argv=None):
    """CLI: the three gen_2d_masks_detic.py forks behind one driver."""
    p = argparse.ArgumentParser(description="CM3D-TPU 2D mask generation stage")
    p.add_argument("--dataset", default="nuscenes",
                   choices=["nuscenes", "kitti", "waymo"])
    p.add_argument("--dataroot", required=True,
                   help="nuScenes root / KITTI root / waymo frame-lite root")
    p.add_argument("--version", default="v1.0-mini")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--scenes", default="",
                   help="comma-separated scenes (KITTI: frame indices)")
    p.add_argument("--thumbnail", type=int, default=1024)  # reference :293
    p.add_argument("--run_nms", type=int, default=-1,
                   help="-1 = dataset default (nusc/waymo on, kitti off)")
    p.add_argument("--fake_weights", action="store_true",
                   help="tiny random-weight models (hermetic smoke run)")
    p.add_argument("--detic_ckpt", default="")
    p.add_argument("--sam_ckpt", default="")
    p.add_argument("--sam_size", default="vit_h",
                   choices=["vit_h", "vit_l", "vit_b"],
                   help="SAM encoder scale matching --sam_ckpt (vit_h is "
                   "the reference's checkpoint; smaller sizes are a "
                   "documented speed/quality deviation)")
    p.add_argument("--clip_ckpt", default="")
    p.add_argument("--bpe_path", default="")
    p.add_argument("--no_resume", action="store_true")
    p.add_argument("--host_shard", action="store_true",
                   help="multi-host: keep only this process's scene stride")
    p.add_argument("--rect_encode", action="store_true",
                   help="SAM encodes without square padding: ~35%% faster "
                   "encode, small documented deviation from SamPredictor "
                   "(see scripts/measure_rect_encode.py numbers)")
    p.add_argument("--quant_int8", action="store_true",
                   help="int8 w8a8 Dense layers in the SAM encoder AND "
                   "the 2D detector's Swin MLPs (Detic, or GroundingDINO "
                   "under --detector gdino; 2x MXU peak; documented "
                   "deviation for both models — see scripts/ab_sam_int8.py"
                   " and scripts/ab_detic_int8.py)")
    p.add_argument("--quant_static", action="store_true",
                   help="with --quant_int8: calibrated static activation "
                   "scales for the SAM encoder — the FIRST keyframe ring "
                   "calibrates (one dynamic-twin encode), later rings "
                   "skip the per-token amax reduce (measured 13.9%% of "
                   "the int8 chain, scripts/ab_int8_scales.py)")
    p.add_argument("--use_zoedepth", action="store_true",
                   help="store per-mask masked metric depth instead of RLE "
                   "masks (reference gen_2d_masks_detic.py:408-451)")
    p.add_argument("--zoe_ckpt", default="",
                   help="ZoeD_N torch checkpoint for --use_zoedepth")
    p.add_argument("--detector", default="detic",
                   choices=("detic", "gdino"),
                   help="2D detector: detic (reference default) or the "
                   "GroundingDINO alternative (reference "
                   "kitti/gen_2d_masks_detic.py:697, commented out there)")
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
                   "divide the ring size, e.g. 2/3/6 for nuScenes)")
    p.add_argument("--encode_chunk", type=int, default=1,
                   help="single-chip SAM encode batching: cameras per scan "
                   "step (must divide the ring size; bit-exact, see "
                   "scripts/ab_sam_batch.py)")
    args = p.parse_args(argv)

    from cm3d_tpu.vocab import CUSTOM_VOCABULARY_NUSCENES, CUSTOM_VOCABULARY_WAYMO

    provider, scene_names, frames_fn = {
        "nuscenes": _nuscenes_provider,
        "kitti": _kitti_provider,
        "waymo": _waymo_provider,
    }[args.dataset](args)
    if args.host_shard:
        from cm3d_tpu.parallel.multihost import shard_for_host

        scene_names = shard_for_host(scene_names)

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

    if args.use_zoedepth:
        models = attach_zoedepth(
            models, args.zoe_ckpt, test=args.fake_weights
        )
    if args.detector == "gdino":
        models = attach_gdino(
            models, args.gdino_ckpt, args.gdino_vocab,
            test=args.fake_weights, quant_int8=args.quant_int8,
            dtype="bfloat16" if args.gdino_bf16 else "float32",
        )

    run_nms = (args.dataset != "kitti") if args.run_nms < 0 else bool(args.run_nms)
    cfg = MaskStageConfig(run_nms=run_nms, thumbnail=args.thumbnail,
                          use_zoedepth=args.use_zoedepth)
    run_mask_stage(
        models, provider, scene_names, frames_fn, args.out_dir, cfg,
        resume=not args.no_resume,
    )


def build_fake_models(seed: int = 0, vocabulary=CUSTOM_VOCABULARY_NUSCENES,
                      rect_encode: bool = False, mesh=None,
                      encode_chunk: int = 1,
                      quant_int8: bool = False,
                      quant_static: bool = False,
                      detic_used: bool = True) -> MaskModels:
    """Tiny random-weight models (hermetic smoke tests / CI) behind the same
    batched wrappers as the real checkpoints."""
    import jax
    import jax.numpy as jnp

    from cm3d_tpu.models.detic import DETIC_TEST, Detic
    from cm3d_tpu.models.sam import SAM_TEST, Sam

    rng = np.random.default_rng(seed)
    detic_model = Detic(DETIC_TEST)
    clf = rng.standard_normal((DETIC_TEST.embed_dim, len(vocabulary))).astype(
        np.float32
    )
    clf /= np.linalg.norm(clf, axis=0, keepdims=True)
    clf = jnp.asarray(clf)
    sam_model = Sam(dataclasses.replace(SAM_TEST, rect_encode=rect_encode))

    img0 = jnp.zeros((64, 64, 3), jnp.float32)
    detic_params = detic_model.init(jax.random.PRNGKey(seed), img0, clf)["params"]
    sq0 = jnp.zeros((SAM_TEST.img_size, SAM_TEST.img_size, 3), jnp.float32)
    sam_params = sam_model.init(
        jax.random.PRNGKey(seed + 1), sq0, jnp.zeros((1, 4), jnp.float32)
    )["params"]
    if quant_int8:
        from cm3d_tpu.models.sam import quantize_sam_params

        sam_model = Sam(dataclasses.replace(
            SAM_TEST, rect_encode=rect_encode, quant_int8=True,
            quant_static=quant_static,
        ))
        sam_params = quantize_sam_params(sam_params)
    if quant_int8 and detic_used:
        from cm3d_tpu.models.detic import quantize_detic_params

        detic_model = Detic(dataclasses.replace(
            DETIC_TEST,
            swin=dataclasses.replace(DETIC_TEST.swin, quant_int8=True),
        ))
        detic_params = quantize_detic_params(detic_params)

    return _batched_model_fns(
        detic_model, detic_params, clf, sam_model, sam_params, vocabulary,
        mesh=mesh, encode_chunk=encode_chunk,
    )


if __name__ == "__main__":
    main()
