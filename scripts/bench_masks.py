"""Mask-stage (Detic+SAM) device benchmark at production geometry.

Random full-size weights (same FLOPs as converted checkpoints). Measures
per-op latency in f32 and bf16 compute, single vs 6-camera execution.

Run: python -c "exec(open('scripts/bench_masks.py').read())"
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

C = 6  # nuScenes camera ring
IMG_H, IMG_W = 576, 1024  # 1024-thumbnail geometry (reference :293)
N_PROMPTS = 128
WARMUP, ITERS = 2, 5


def sync(x):
    leaves = jax.tree.leaves(x)
    return float(np.asarray(jnp.sum(leaves[0].astype(jnp.float32))))


def timeit(name, fn, *args):
    for _ in range(WARMUP):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        sync(fn(*args))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:40s} {dt:9.1f} ms", flush=True)
    return dt


def zeros_like_tree(tree):
    return jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), tree)


def main():
    from cm3d_tpu.models.detic import DETIC_SWINB, Detic, preprocess_rgb
    from cm3d_tpu.models.sam import SAM_VIT_H, Sam
    from cm3d_tpu.models.swin import SWIN_B

    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    results = {}

    img = preprocess_rgb(rng.integers(0, 255, (IMG_H, IMG_W, 3)).astype(np.uint8))
    imgs = jnp.asarray(np.stack([img] * C))
    img = jnp.asarray(img)

    # ---- Detic ----
    clf = jnp.asarray(
        rng.standard_normal((DETIC_SWINB.embed_dim, 18)).astype(np.float32)
    )

    def detic_fns(cfg):
        model = Detic(cfg)
        shapes = jax.eval_shape(
            lambda r: model.init(r, jnp.zeros_like(img), clf),
            jax.random.PRNGKey(0),
        )["params"]
        params = zeros_like_tree(shapes)
        single = jax.jit(
            lambda p, i: model.apply({"params": p}, i, clf).scores
        )
        batch = jax.jit(
            jax.vmap(
                lambda p, i: model.apply({"params": p}, i, clf).scores,
                in_axes=(None, 0),
            )
        )
        return params, single, batch

    params, f_single, f_batch = detic_fns(DETIC_SWINB)
    sync(f_single(params, img))
    results["detic_f32_single_ms"] = timeit("detic f32 single", f_single, params, img)
    sync(f_batch(params, imgs))
    results["detic_f32_batch6_ms"] = timeit("detic f32 batch6", f_batch, params, imgs)

    cfg_bf = dataclasses.replace(
        DETIC_SWINB, dtype="bfloat16",
        swin=dataclasses.replace(SWIN_B, dtype="bfloat16"),
    )
    params_bf, fb_single, fb_batch = detic_fns(cfg_bf)
    sync(fb_single(params_bf, img))
    results["detic_bf16_single_ms"] = timeit(
        "detic bf16 single", fb_single, params_bf, img
    )
    sync(fb_batch(params_bf, imgs))
    results["detic_bf16_batch6_ms"] = timeit(
        "detic bf16 batch6", fb_batch, params_bf, imgs
    )

    # ---- SAM ----
    sq = jnp.asarray(rng.standard_normal((1024, 1024, 3)).astype(np.float32))
    sqs = jnp.asarray(np.stack([np.asarray(sq)] * C))
    boxes = jnp.asarray(rng.uniform(0, 1000, (N_PROMPTS, 4)).astype(np.float32))
    boxes_b = jnp.asarray(np.stack([np.asarray(boxes)] * C))

    def sam_fns(cfg):
        model = Sam(cfg)
        shapes = jax.eval_shape(
            lambda r: model.init(r, jnp.zeros_like(sq), boxes[:1]),
            jax.random.PRNGKey(0),
        )["params"]
        params = zeros_like_tree(shapes)
        enc = jax.jit(
            lambda p, x: model.apply({"params": p}, x, method=model.encode_image)
        )

        def enc_scan_f(p, xs):
            def body(carry, x):
                e = model.apply({"params": p}, x[None], method=model.encode_image)
                return carry, e[0]
            _, es = jax.lax.scan(body, 0, xs)
            return es

        enc_scan = jax.jit(enc_scan_f)
        dec = jax.jit(
            lambda p, e, b: model.apply(
                {"params": p}, e, b, method=model.decode_boxes
            )[0]
        )
        dec_b = jax.jit(
            jax.vmap(
                lambda p, e, b: model.apply(
                    {"params": p}, e, b, method=model.decode_boxes
                )[0],
                in_axes=(None, 0, 0),
            )
        )
        return params, enc, enc_scan, dec, dec_b

    sp, enc, enc_scan, dec, dec_b = sam_fns(SAM_VIT_H)
    emb1 = enc(sp, sq[None])
    sync(emb1)
    results["sam_enc_f32_single_ms"] = timeit(
        "sam encode f32 single", enc, sp, sq[None]
    )
    sync(dec(sp, emb1[0], boxes))
    results["sam_dec_f32_128_ms"] = timeit(
        "sam decode f32 128 prompts", dec, sp, emb1[0], boxes
    )

    cfg_bf = dataclasses.replace(SAM_VIT_H, dtype="bfloat16")
    spb, encb, encb_scan, decb, decb_b = sam_fns(cfg_bf)
    sync(encb(spb, sq[None]))
    results["sam_enc_bf16_single_ms"] = timeit(
        "sam encode bf16 single", encb, spb, sq[None]
    )
    embs = encb_scan(spb, sqs)
    sync(embs)
    results["sam_enc_bf16_scan6_ms"] = timeit(
        "sam encode bf16 scan6", encb_scan, spb, sqs
    )
    sync(decb_b(spb, embs, boxes_b))
    results["sam_dec_bf16_batch6x128_ms"] = timeit(
        "sam decode bf16 batch6x128", decb_b, spb, embs, boxes_b
    )

    est = (results["detic_bf16_batch6_ms"] + results["sam_enc_bf16_scan6_ms"]
           + results["sam_dec_bf16_batch6x128_ms"])
    print(f"\nbf16 device total per keyframe: {est:.0f} ms "
          f"({1000/est:.2f} kf/s)", flush=True)
    print(json.dumps(results), flush=True)
    with open("/tmp/mask_bench.json", "w") as fjs:
        json.dump(results, fjs)




def bench_end_to_end(dtype="bfloat16", n_frames=8):
    """Pipelined mask-stage bench — now lives in cm3d_tpu.benchmarks."""
    from cm3d_tpu.benchmarks import bench_mask_stage

    result = bench_mask_stage(dtype=dtype, n_frames=n_frames)
    print(json.dumps(result), flush=True)
    return result["value"]


import os as _os
if _os.environ.get("MASK_BENCH_E2E"):
    bench_end_to_end()
else:
    main()
