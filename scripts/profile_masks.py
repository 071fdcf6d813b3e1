"""Per-phase wall-time profile of the mask-stage pipeline on the real chip.

Breaks one keyframe into its host-visible phases so the pipelined driver's
gap vs the pure device-op sum (MASK_BENCH_r02.json) is attributable:

  prepare      host canvas assembly + u8 device_put dispatch
  enc_dispatch sam encode jit dispatch (async)
  det_wait     detic dispatch + np.asarray sync (waits on the device queue)
  nms          host class-wise NMS + map_class
  dec_dispatch fused decode->planes jit dispatch (async)
  dl_wait      planes np.asarray download sync
  encode       packed bit-planes -> COCO RLE (C, no dense intermediate)
  write        artifact json+pkl write

Run: python -c "exec(open('scripts/profile_masks.py').read())"
"""

import dataclasses as dc
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

C = 6
IMG_H, IMG_W = 576, 1024
N_FRAMES = 6


def main():
    from cm3d_tpu.config import MaskStageConfig
    from cm3d_tpu.datasets.artifacts import MaskArtifactStore
    from cm3d_tpu.models.detic import DETIC_SWINB, Detic
    from cm3d_tpu.models.sam import SAM_VIT_H, Sam
    from cm3d_tpu.models.swin import SWIN_B
    from cm3d_tpu.ops.bitmask import num_words, pack_masks_np
    from cm3d_tpu.pipelines import masks as M
    from cm3d_tpu.vocab import CUSTOM_VOCABULARY_NUSCENES as VOCAB

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    detic_cfg = dc.replace(
        DETIC_SWINB, dtype="bfloat16", swin=dc.replace(SWIN_B, dtype="bfloat16")
    )
    sam_cfg = dc.replace(SAM_VIT_H, dtype="bfloat16")
    detic_model, sam_model = Detic(detic_cfg), Sam(sam_cfg)
    clf = jnp.asarray(
        rng.standard_normal((detic_cfg.embed_dim, len(VOCAB))).astype(np.float32)
    )
    img0 = jnp.zeros((IMG_H, IMG_W, 3), jnp.float32)
    dshapes = jax.eval_shape(
        lambda r: detic_model.init(r, img0, clf), jax.random.PRNGKey(0)
    )["params"]
    dparams = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), dshapes)
    sshapes = jax.eval_shape(
        lambda r: sam_model.init(
            r, jnp.zeros((1024, 1024, 3)), jnp.zeros((1, 4))
        ),
        jax.random.PRNGKey(0),
    )["params"]
    sparams = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), sshapes)
    models = M._batched_model_fns(
        detic_model, dparams, clf, sam_model, sparams, VOCAB
    )

    cfg = MaskStageConfig()
    images = [
        rng.integers(0, 255, (IMG_H, IMG_W, 3)).astype(np.uint8)
        for _ in range(C)
    ]
    cam_hw = tuple((im.shape[0], im.shape[1]) for im in images)
    plane_wh = (max(w for _, w in cam_hw), max(h for h, _ in cam_hw))
    nw = num_words(cfg.max_masks_total)

    # realistic ~25 detections/cam without depending on random-weight output
    k = 25
    fake_boxes = rng.uniform(0, 500, (C, DETIC_SWINB.max_detections, 4)).astype(
        np.float32
    )
    fake_boxes[..., 2:] += fake_boxes[..., :2] + 30
    fake_scores = rng.random((C, DETIC_SWINB.max_detections)).astype(np.float32)
    fake_classes = rng.integers(0, len(VOCAB), (C, DETIC_SWINB.max_detections))
    vb = np.zeros((C, DETIC_SWINB.max_detections), bool)
    vb[:, :k] = True

    blob = np.zeros((128, IMG_W, IMG_H), np.uint8)
    for i in range(128):
        x, y = rng.integers(0, IMG_W - 150), rng.integers(0, IMG_H - 100)
        blob[i, x : x + 120, y : y + 90] = 1
    blob_planes_yx = np.ascontiguousarray(
        np.swapaxes(pack_masks_np(blob), 0, 1)
    )

    import tempfile

    store = MaskArtifactStore(tempfile.mkdtemp(prefix="maskprof_"))

    def one_frame(fi, t):
        def tick(name, t0):
            dt = time.perf_counter() - t0
            t[name] = t.get(name, 0.0) + dt
            return time.perf_counter()

        t0 = time.perf_counter()
        frame = models.prepare(images)
        t0 = tick("prepare", t0)
        det = models.detic(frame)
        t0 = tick("det_dispatch", t0)
        emb = models.sam_encode(frame)
        t0 = tick("enc_dispatch", t0)
        det_np = [np.asarray(x) for x in det]
        t0 = tick("det_wait", t0)
        # host NMS on the realistic load
        boxes_b, scores_b, cids_b, valid_b = (
            fake_boxes, fake_scores, fake_classes, vb,
        )
        p = cfg.max_detections
        prompts = np.zeros((C, p, 4), np.float32)
        n_boxes = np.zeros(C, np.int32)
        all_labels, all_scores, all_cams = [], [], []
        total = 0
        for cam in range(C):
            v = valid_b[cam]
            bx, sc = boxes_b[cam][v], scores_b[cam][v]
            labels = [
                M.map_class(VOCAB[c].lower()) for c in cids_b[cam][v]
            ]
            kept = M.classwise_nms_np(bx, sc, labels, cfg.nms_iou)
            bx, sc = bx[kept], sc[kept]
            labels = [labels[i] for i in kept]
            kk = min(len(bx), p, cfg.max_masks_total - total)
            prompts[cam, :kk] = bx[:kk]
            n_boxes[cam] = kk
            all_labels.extend(labels[:kk])
            all_scores.extend(float(s) for s in sc[:kk])
            all_cams.extend([cam] * kk)
            total += kk
        t0 = tick("nms", t0)
        pmax = int(n_boxes.max())
        bucket = next(
            (b for b in sorted(cfg.prompt_buckets) if b >= pmax), p
        )
        planes = models.sam_decode_planes(
            emb, prompts[:, :bucket], n_boxes, cam_hw, plane_wh, nw, "yx"
        )
        t0 = tick("dec_dispatch", t0)
        planes_np = np.asarray(planes)
        t0 = tick("dl_wait", t0)
        from cm3d_tpu.ops import rle as rle_codec

        rles = rle_codec.encode_packed_many(blob_planes_yx, total, layout="yx")
        t0 = tick("encode", t0)
        store.write_frame_rles(
            "prof", fi, all_labels, all_scores, all_cams, rles
        )
        t0 = tick("write", t0)

    t = {}
    one_frame(0, {})  # compile warmup
    one_frame(1, {})
    tw0 = time.perf_counter()
    for i in range(N_FRAMES):
        one_frame(2 + i, t)
    wall = (time.perf_counter() - tw0) / N_FRAMES * 1000
    for kk in t:
        t[kk] = round(t[kk] / N_FRAMES * 1000, 1)
    t["TOTAL_ms_per_kf_sequential"] = round(wall, 1)
    print(json.dumps(t, indent=1), flush=True)
    with open("/tmp/mask_profile.json", "w") as f:
        json.dump(t, f)


main()
