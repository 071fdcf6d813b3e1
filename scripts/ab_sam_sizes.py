"""A/B: SAM encoder family (--sam_size vit_h/vit_l/vit_b) encode latency
at production geometry (1024x1024, bf16, random full-size weights) on the
axon chip — the datapoint behind the README's --sam_size speed offer.

Run: python -c "exec(open('scripts/ab_sam_sizes.py').read())"
(axon gotcha: sync via host transfer, subtract nothing — we report the
steady-state in-process mean which amortizes the ~28 ms tunnel round trip
across ITERS syncs, same method as bench.py)
"""

import dataclasses as dc
import time

import jax
import jax.numpy as jnp
import numpy as np

from cm3d_tpu.models.sam import SAM_PRESETS, Sam

ITERS = 10


def sync(x):
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 1024, 1024, 3)).astype(np.float32))
    results = {}
    for name, base in SAM_PRESETS.items():
        cfg = dc.replace(base, dtype="bfloat16")
        model = Sam(cfg)
        params = jax.eval_shape(
            lambda m=model: m.init(jax.random.PRNGKey(0),
                                   jnp.zeros((64, 64, 3)), jnp.zeros((1, 4)))
        )["params"]
        params = jax.tree.map(
            lambda p: jnp.asarray(
                np.random.default_rng(1).standard_normal(p.shape) * 0.02,
                p.dtype),
            params)
        enc = jax.jit(lambda p, xi, m=model: m.apply(
            {"params": p}, xi, method=m.encode_image))
        sync(enc(params, x))  # compile
        sync(enc(params, x))  # warm
        t0 = time.perf_counter()
        for _ in range(ITERS):
            sync(enc(params, x))
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        results[name] = ms
        print(f"{name}: {ms:.1f} ms/encode "
              f"(dim {cfg.encoder_dim}, depth {cfg.encoder_depth})",
              flush=True)
        # free the params before building the next size (ViT-H is 2.5 GB)
        del params, enc
    h = results.get("vit_h")
    for name, ms in results.items():
        if h:
            print(f"{name}: {h / ms:.2f}x vs vit_h")


main()
