"""Detic latency breakdown at production geometry: which stage eats the time.

Run: python -c "exec(open('scripts/profile_detic.py').read())"
"""

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

IMG_H, IMG_W = 576, 1024
WARMUP, ITERS = 2, 5


def sync(x):
    return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32))))


def timeit(name, fn, *args):
    for _ in range(WARMUP):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        sync(fn(*args))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:44s} {dt:9.1f} ms", flush=True)
    return dt


def main():
    from cm3d_tpu.models.detic import (
        DETIC_SWINB, Detic, decode_proposals, preprocess_rgb,
    )
    from cm3d_tpu.models.swin import SWIN_B, SwinTransformer
    from cm3d_tpu.ops.nms import nms_2d_classwise
    from cm3d_tpu.ops.roi_align import multilevel_roi_align

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    cfg = dataclasses.replace(
        DETIC_SWINB, dtype="bfloat16",
        swin=dataclasses.replace(SWIN_B, dtype="bfloat16"),
    )
    model = Detic(cfg)
    clf = jnp.asarray(rng.standard_normal((cfg.embed_dim, 18)).astype(np.float32))
    img = jnp.asarray(
        preprocess_rgb(rng.integers(0, 255, (IMG_H, IMG_W, 3)).astype(np.uint8))
    )
    shapes = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros_like(img), clf), jax.random.PRNGKey(0)
    )["params"]
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)

    # 1. backbone only
    swin = SwinTransformer(cfg.swin)
    f_bb = jax.jit(
        lambda p, i: swin.apply({"params": p["backbone"]}, i[None])
    )
    sync(f_bb(params, img))
    timeit("swin backbone", f_bb, params, img)

    # 2. backbone + fpn + proposal head (maps only)
    def heads(p, i):
        def fwd(mdl, im):
            feats = mdl.backbone(im[None])
            levels = mdl.fpn(feats)
            hms, regs = mdl.proposal_head(levels)
            return hms, regs
        return model.apply({"params": p}, i, method=fwd)

    f_h = jax.jit(heads)
    sync(f_h(params, img))
    timeit("+ fpn + proposal head", f_h, params, img)

    # 3. + proposal decode (topk + per-level NMS)
    def props(p, i):
        def fwd(mdl, im):
            feats = mdl.backbone(im[None])
            levels = mdl.fpn(feats)
            strides = {l: s for l, s in zip(sorted(levels), cfg.strides)}
            hms, regs = mdl.proposal_head(levels)
            return decode_proposals(hms, regs, strides, cfg)
        return model.apply({"params": p}, i, method=fwd)

    f_p = jax.jit(props)
    sync(f_p(params, img))
    timeit("+ decode_proposals (topk+NMS)", f_p, params, img)

    # 4. + roi align x3 (no heads)
    def rois(p, i):
        def fwd(mdl, im):
            feats = mdl.backbone(im[None])
            levels = mdl.fpn(feats)
            strides = {l: s for l, s in zip(sorted(levels), cfg.strides)}
            hms, regs = mdl.proposal_head(levels)
            boxes, sc = decode_proposals(hms, regs, strides, cfg)
            fs = {l: levels[l][0] for l in levels}
            acc = 0.0
            for _ in range(3):
                pooled = multilevel_roi_align(
                    fs, boxes, strides, cfg.pooler_size, min(strides), max(strides)
                )
                acc = acc + jnp.sum(pooled)
            return acc
        return model.apply({"params": p}, i, method=fwd)

    f_r = jax.jit(rois)
    sync(f_r(params, img))
    timeit("+ 3x multilevel_roi_align", f_r, params, img)

    # 5. full forward
    f_full = jax.jit(lambda p, i: model.apply({"params": p}, i, clf).scores)
    sync(f_full(params, img))
    timeit("full detic", f_full, params, img)

    # 6. final NMS alone at [128]
    boxes = jnp.asarray(rng.uniform(0, 1000, (128, 4)).astype(np.float32))
    scores = jnp.asarray(rng.random(128).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 10, 128).astype(np.int32))
    f_nms = jax.jit(
        lambda b, s, l: nms_2d_classwise(b, s, l, s > 0.1, 0.5)
    )
    sync(f_nms(boxes, scores, labels))
    timeit("final nms_2d_classwise [128]", f_nms, boxes, scores, labels)

    # 7. proposal NMS alone at [1000]
    b2 = jnp.asarray(rng.uniform(0, 1000, (1000, 4)).astype(np.float32))
    s2 = jnp.asarray(rng.random(1000).astype(np.float32))
    f_nms2 = jax.jit(
        lambda b, s: nms_2d_classwise(b, s, jnp.zeros(1000, jnp.int32), s > 0, 0.9)
    )
    sync(f_nms2(b2, s2))
    timeit("proposal nms [1000]", f_nms2, b2, s2)


main()
