"""On-chip A/B: SAM ViT-H encode_image with fused windowed blocks vs
unfused, production geometry (1024x1024 -> 64x64 grid, C=1280, bf16).

Run: python -c "exec(open('scripts/ab_sam_fused.py').read())"
Optionally set GROUPS (comma list of fused_group_tokens) via env.
"""

import dataclasses as dc
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from cm3d_tpu.models.sam import SAM_VIT_H, Sam

WARMUP, ITERS = 2, 8


def sync(x):
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def timeit(name, fn, *args):
    try:
        for _ in range(WARMUP):
            sync(fn(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = fn(*args)
        sync(out)
        dt = (time.perf_counter() - t0) / ITERS * 1000
        print(f"{name:44s} {dt:7.2f} ms", flush=True)
        return dt, out
    except Exception as e:  # noqa: BLE001
        print(f"{name:44s} FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
        return None, None


def main():
    base = dc.replace(SAM_VIT_H, dtype="bfloat16",
                      fused_window_attn=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((1, 1024, 1024, 3)).astype(np.float32)
    )

    model = Sam(base)
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((64, 64, 3)), jnp.zeros((1, 4)))
    )["params"]
    params = jax.tree.map(
        lambda p: jnp.asarray(
            np.random.default_rng(1).standard_normal(p.shape) * 0.02,
            p.dtype),
        params)

    def enc(cfg):
        m = Sam(cfg)
        return jax.jit(lambda p, xi: m.apply(
            {"params": p}, xi, method=m.encode_image))

    t_ref, out_ref = timeit("unfused encode", enc(base), params, x)

    groups = os.environ.get("GROUPS", "392,980")
    for g in [int(v) for v in groups.split(",")]:
        cfg = dc.replace(base, fused_window_attn=True,
                         fused_group_tokens=g)
        t, out = timeit(f"fused encode (group_tokens={g})",
                        enc(cfg), params, x)
        if out is not None and out_ref is not None:
            d = np.abs(np.asarray(out, np.float32)
                       - np.asarray(out_ref, np.float32))
            print(f"  max|diff| vs unfused: {d.max():.4f} "
                  f"mean {d.mean():.5f}", flush=True)


main()
