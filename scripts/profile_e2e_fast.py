"""Phase-profile the COMPOSED deploy profile (vit_b + rect_encode + int8)
— VERDICT r05 item 1: the published point is ~366 ms/kf
(MASK_BENCH_r04.json) but its own FLOP accounting implies only ~50-100 ms
of device compute. Attribute the rest.

Three measurements in ONE process/window (comparable, per BENCH
DISCIPLINE in CLAUDE.md):

1. `phases`   — sequential per-frame breakdown with forced host syncs
   (each sync measures the device work since the previous sync + the
   ~28 ms tunnel round trip): canvas prepare/upload, Detic, SAM encode,
   host NMS, decode, keyframe assemble, batch stack, lift step.
2. `arms`     — the REAL pipelined loop (run_fused via bench_e2e's frame
   source) in a 2x2: {images uploaded per frame | device-resident} x
   {lift payload uploaded per batch | device-resident}. If the full-
   upload arm is slow and the device-resident arm collapses to device
   time, the profile is tunnel-UPLOAD-bound (an axon artifact: on a
   production host the images/points arrive over local PCIe at GB/s).
3. `probes`   — raw tunnel characteristics: round-trip latency of a
   trivial sync, and device_put bandwidth at canvas size (10.6 MB u8)
   and lift-points size, so the arithmetic closes.

Run: python -c "exec(open('scripts/profile_e2e_fast.py').read())"
CM3D_AB_SMOKE=1: tiny shapes on CPU (plumbing only).

Reference context: the 2D hot loops this stage rebuilds are
src/nuscenes/gen_2d_masks_detic.py:303,393 (Detic/SAM GPU loops).
"""

import dataclasses
import json
import os
import time

smoke = os.environ.get("CM3D_AB_SMOKE") == "1"

import jax  # noqa: E402

if smoke:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cm3d_tpu import benchmarks as B  # noqa: E402
from cm3d_tpu.config import (  # noqa: E402
    CLASS_TO_ID,
    LiftStageConfig,
    MaskStageConfig,
)
from cm3d_tpu.datasets.nuscenes.frontend import get_detection_name  # noqa: E402
from cm3d_tpu.datasets.synthetic import SyntheticConfig, make_keyframe  # noqa: E402
from cm3d_tpu.ops.bitmask import num_words  # noqa: E402
from cm3d_tpu.parallel import make_keyframe_step_fn  # noqa: E402
from cm3d_tpu.pipelines import masks as M  # noqa: E402
from cm3d_tpu.pipelines.e2e import run_fused  # noqa: E402

if smoke:
    # fixture geometry (tests/test_e2e_pipeline.py SMALL)
    B.IMG_W, B.IMG_H = 160, 90  # _realistic_load blob geometry follows
    LIFT_CFG = LiftStageConfig(
        max_points=16384, max_masks=32, max_points_per_mask=512,
        max_points_per_camera=8192, max_points_in_masks=2048,
        max_lane_points=1024, image_ratio=0.1,
    )
    MASK_CFG = MaskStageConfig(max_detections=16, max_masks_total=32)
    SYN = SyntheticConfig(image_w=160, image_h=90, points_per_frame=2000,
                          objects_per_frame=8, focal=81.0)
    N_FRAMES, BATCH = 4, 2
else:
    LIFT_CFG = LiftStageConfig()
    MASK_CFG = MaskStageConfig(dtype="bfloat16")
    SYN = SyntheticConfig()
    N_FRAMES, BATCH = 12, 4

C, IMG_H, IMG_W = B.C, B.IMG_H, B.IMG_W
assert MASK_CFG.max_masks_total == LIFT_CFG.max_masks


def sync(x):
    """Force completion: a real host transfer (axon block_until_ready can
    return early)."""
    return np.asarray(jnp.sum(jnp.asarray(x), dtype=jnp.float32))


def build_models():
    if smoke:
        models = M.build_fake_models(rect_encode=True, quant_int8=True)
    else:
        models = B.build_production_fake_models(
            "bfloat16", rect_encode=True, quant_int8=True, sam_size="vit_b"
        )
    return B._realistic_load(models)


def make_images(rng):
    return [
        [rng.integers(0, 255, (IMG_H, IMG_W, 3)).astype(np.uint8)
         for _ in range(C)]
        for _ in range(2)
    ]


def make_assemble(base, token, m_pad):
    """bench_e2e's keyframe assembly, verbatim semantics."""

    def assemble(handle):
        if handle["planes"] is None:
            return None
        labels = handle["labels"]
        m_real = min(len(labels), m_pad)
        mask_cam = np.zeros(m_pad, np.int32)
        mask_label = np.zeros(m_pad, np.int32)
        mask_score = np.zeros(m_pad, np.float32)
        mask_valid = np.zeros(m_pad, bool)
        for j in range(m_real):
            name = get_detection_name(labels[j])
            if name not in CLASS_TO_ID:
                continue
            mask_cam[j] = handle["cams"][j]
            mask_label[j] = CLASS_TO_ID[name]
            mask_score[j] = handle["scores"][j]
            mask_valid[j] = True
        kf = base._replace(
            mask_bits=handle["planes"], mask_cam=mask_cam,
            mask_label=mask_label, mask_score=mask_score,
            mask_valid=mask_valid,
        )
        return kf, token

    return assemble


def sequential_phases(models, step, images, base_kfs, n_frames):
    """Per-frame phase table with forced syncs. Syncs serialize what the
    pipelined loop overlaps — the TOTAL here is an upper bound; the point
    is per-phase attribution."""
    t: dict = {}

    def tick(name, t0):
        dt = time.perf_counter() - t0
        t[name] = t.get(name, 0.0) + dt
        return time.perf_counter()

    m_pad = LIFT_CFG.max_masks
    nwords = num_words(MASK_CFG.max_masks_total)
    cfg = MASK_CFG
    pending = []
    for fi in range(n_frames):
        imgs = images[fi % 2]
        base = base_kfs[fi % 2]
        t0 = time.perf_counter()
        frame = models.prepare(imgs)
        t0 = tick("prepare_dispatch", t0)
        sync(frame["dev"])
        t0 = tick("canvas_upload_sync", t0)
        det = models.detic(frame)
        t0 = tick("detic_dispatch", t0)
        emb = models.sam_encode(frame)
        t0 = tick("enc_dispatch", t0)
        det_np = [np.asarray(x) for x in det]  # _Lazy syncs the real detic
        t0 = tick("detic_wait", t0)
        sync(emb)
        t0 = tick("enc_wait", t0)
        # host NMS + prompt packing (start_frame_masks:156-196 semantics)
        boxes_b, scores_b, cids_b, valid_b = det_np
        cam_hw = tuple((im.shape[0], im.shape[1]) for im in imgs)
        plane_wh = (max(w for _, w in cam_hw), max(h for h, _ in cam_hw))
        p = cfg.max_detections
        cap = cfg.max_masks_total
        prompts = np.zeros((C, p, 4), np.float32)
        n_boxes = np.zeros(C, np.int32)
        all_labels, all_scores, all_cams = [], [], []
        total = 0
        for cam in range(C):
            v = valid_b[cam]
            bx, sc, ci = boxes_b[cam][v], scores_b[cam][v], cids_b[cam][v]
            if len(bx) == 0:
                continue
            labels = [M.map_class(models.vocabulary[c].lower()) for c in ci]
            kept = M.classwise_nms_np(bx, sc, labels, cfg.nms_iou)
            bx, sc = bx[kept], sc[kept]
            labels = [labels[i] for i in kept]
            k = min(len(bx), p, max(cap - total, 0))
            if k <= 0:
                continue
            if k < len(bx):
                top = np.sort(np.argsort(-sc, kind="stable")[:k])
                bx, sc = bx[top], sc[top]
                labels = [labels[i] for i in top]
            prompts[cam, :k] = bx[:k]
            n_boxes[cam] = k
            all_labels.extend(labels[:k])
            all_scores.extend(float(s) for s in sc[:k])
            all_cams.extend([cam] * k)
            total += k
        t0 = tick("nms_host", t0)
        pmax = int(n_boxes.max())
        bucket = next(
            (b for b in sorted(cfg.prompt_buckets) if b >= pmax), p
        )
        planes = models.sam_decode_planes(
            emb, prompts[:, :bucket], n_boxes, cam_hw, plane_wh, nwords,
            "xy",
        )
        t0 = tick("dec_dispatch", t0)
        sync(planes)
        t0 = tick("dec_wait", t0)
        handle = {"planes": planes, "labels": all_labels,
                  "scores": all_scores, "cams": all_cams}
        out = make_assemble(base, fi, m_pad)(handle)
        t0 = tick("assemble_host", t0)
        if out is not None:
            pending.append(out)
        if len(pending) == BATCH:
            kfs = [kf for kf, _ in pending]
            t0 = time.perf_counter()
            batch = jax.tree.map(
                lambda *xs: (jnp.stack(xs) if isinstance(xs[0], jax.Array)
                             else np.stack(xs)), *kfs)
            t0 = tick("stack", t0)
            _, boxes = step(batch)
            t0 = tick("step_dispatch", t0)
            sync(boxes.centers)
            t0 = tick("step_wait", t0)
            boxes_np = jax.tree.map(np.asarray, boxes)
            t0 = tick("boxes_download", t0)
            del boxes_np
            pending = []
    for k in list(t):
        t[k] = round(t[k] / n_frames * 1000, 2)
    t["TOTAL_ms_per_kf_sequential"] = round(sum(t.values()), 1)
    return t


def pipelined_arm(models, step, images, base_kfs, upload_images,
                  upload_lift, n_frames):
    """The real run_fused loop; device-resident variants isolate the
    tunnel uploads from the pipeline."""
    m_pad = LIFT_CFG.max_masks
    if not upload_lift:
        base_kfs = [jax.tree.map(jnp.asarray, kf) for kf in base_kfs]
    use_models = models
    if not upload_images:
        cache = [models.prepare(images[0]), models.prepare(images[1])]
        sync(cache[0]["dev"]), sync(cache[1]["dev"])
        idx = {id(images[0]): 0, id(images[1]): 1}
        use_models = dataclasses.replace(
            models, prepare=lambda imgs: cache[idx[id(imgs)]]
        )

    def frame_source(n):
        for i in range(n):
            yield images[i % 2], make_assemble(base_kfs[i % 2], i, m_pad)

    done = run_fused(use_models, step, frame_source(BATCH), MASK_CFG,
                     lambda tok, b: None, BATCH)  # warm
    seen = [0]

    def on_boxes(tok, b):
        seen[0] += int(np.asarray(b.keep).sum())

    t0 = time.perf_counter()
    done = run_fused(use_models, step, frame_source(n_frames), MASK_CFG,
                     on_boxes, BATCH)
    dt = time.perf_counter() - t0
    return {"ms_per_kf": round(dt / done * 1000, 1), "frames": done,
            "boxes": seen[0], "upload_images": upload_images,
            "upload_lift": upload_lift}


def tunnel_probes(images, base_kfs):
    out = {}
    # round-trip latency of a trivial computation+transfer
    small = jnp.zeros((8, 8), jnp.float32)
    sync(small)
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        sync(small)
    out["rtt_ms"] = round((time.perf_counter() - t0) / n * 1000, 2)
    # canvas-size u8 upload bandwidth (the per-frame image payload)
    canvas = np.zeros((C, IMG_H, IMG_W, 3), np.uint8)
    for reps, key, payload in (
        (5, "canvas_upload", canvas),
        (5, "points_upload", np.zeros(
            (BATCH, LIFT_CFG.max_points, 4), np.float32)),
    ):
        sync(jax.device_put(payload))  # warm any layout program
        t0 = time.perf_counter()
        for _ in range(reps):
            sync(jax.device_put(payload))
        dt = (time.perf_counter() - t0) / reps
        out[f"{key}_ms"] = round(dt * 1000, 1)
        out[f"{key}_MBps"] = round(payload.nbytes / dt / 1e6, 1)
    # per-frame upload inventory (what the full-upload arm pays per kf)
    kf_bytes = sum(
        np.asarray(x).nbytes for x in jax.tree.leaves(base_kfs[0])
    )
    out["canvas_bytes_per_kf"] = canvas.nbytes
    out["keyframe_bytes_per_kf"] = kf_bytes
    return out


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    models = build_models()
    images = make_images(rng)
    base_kfs = [make_keyframe(SYN, LIFT_CFG, rng) for _ in range(2)]
    step = jax.jit(make_keyframe_step_fn(LIFT_CFG))

    report = {"config": "smoke" if smoke else "vit_b+rect+int8 production",
              "n_frames": N_FRAMES, "batch": BATCH}

    # the pipelined full-upload arm FIRST (it is the published number and
    # warms every compile), then the phase table, then the ablations
    report["arms"] = [
        pipelined_arm(models, step, images, base_kfs, True, True, N_FRAMES)
    ]
    report["phases"] = sequential_phases(
        models, step, images, base_kfs, N_FRAMES
    )
    for up_img, up_lift in ((False, True), (True, False), (False, False)):
        report["arms"].append(
            pipelined_arm(models, step, images, base_kfs, up_img, up_lift,
                          N_FRAMES)
        )
    report["probes"] = tunnel_probes(images, base_kfs)
    print(json.dumps(report, indent=1), flush=True)
    with open("PROFILE_E2E_FAST_r05.json", "w") as f:
        json.dump(report, f, indent=1)


main()
