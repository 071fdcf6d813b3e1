"""Op-level TPU profile of SAM encode / Detic via xplane parsing.

Run: python -c "exec(open('scripts/profile_ops.py').read())"
"""

import dataclasses
import glob
import time

import jax
import jax.numpy as jnp
import numpy as np

IMG_H, IMG_W = 576, 1024


def sync(x):
    return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32))))


def profile_fn(tag, fn, *args, iters=3):
    sync(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(fn(*args))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{tag:30s} {dt:9.1f} ms", flush=True)
    import shutil
    logdir = f"/tmp/prof_{tag}"
    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        for _ in range(iters):
            sync(fn(*args))
    print(f"trace -> {logdir}", flush=True)


def main():
    from cm3d_tpu.models.detic import DETIC_SWINB, Detic, preprocess_rgb
    from cm3d_tpu.models.sam import SAM_VIT_H, Sam
    from cm3d_tpu.models.swin import SWIN_B

    rng = np.random.default_rng(0)

    sam_cfg = dataclasses.replace(SAM_VIT_H, dtype="bfloat16")
    sam = Sam(sam_cfg)
    sq = jnp.asarray(rng.standard_normal((1, 1024, 1024, 3)).astype(np.float32))
    shp = jax.eval_shape(
        lambda r: sam.init(r, jnp.zeros((1024, 1024, 3)), jnp.zeros((1, 4))),
        jax.random.PRNGKey(0),
    )["params"]
    sp = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), shp)
    enc = jax.jit(lambda p, x: sam.apply({"params": p}, x, method=sam.encode_image))
    profile_fn("sam_enc_bf16", enc, sp, sq)

    cfg = dataclasses.replace(
        DETIC_SWINB, dtype="bfloat16",
        swin=dataclasses.replace(SWIN_B, dtype="bfloat16"),
    )
    detic = Detic(cfg)
    clf = jnp.asarray(rng.standard_normal((cfg.embed_dim, 18)).astype(np.float32))
    img = jnp.asarray(
        preprocess_rgb(rng.integers(0, 255, (IMG_H, IMG_W, 3)).astype(np.uint8))
    )
    dshp = jax.eval_shape(
        lambda r: detic.init(r, jnp.zeros_like(img), clf), jax.random.PRNGKey(0)
    )["params"]
    dp = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), dshp)
    f = jax.jit(lambda p, i: detic.apply({"params": p}, i, clf).scores)
    profile_fn("detic_bf16", f, dp, img)


main()
