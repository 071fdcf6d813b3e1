"""On-chip A/B: SAM ViT-H encode of a 6-camera ring as a batch-1 scan
(the production path in pipelines/masks._batched_model_fns.enc_scan_u8)
vs chunked batch-B encodes (scan over ceil(6/B) chunks of batch B).

Hypothesis: the big matmuls ([4096,1280]x[1280,5120] MLPs) are MXU-bound
at batch-1 already, but the elementwise/LayerNorm/softmax islands and the
25-window attention batches may amortize with B>1 — worth a measurement
before touching the pipeline. Memory risk: the 4 global-attn blocks carry
~0.5 GB of logits at batch-1, so B=6 may OOM; the script reports failures
per B instead of dying.

Run: python -c "exec(open('scripts/ab_sam_batch.py').read())"
"""

import dataclasses as dc
import time

import jax
import jax.numpy as jnp
import numpy as np

from cm3d_tpu.models.sam import SAM_VIT_H, Sam

WARMUP, ITERS = 2, 6
N_CAMS = 6


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
        print(f"{name:40s} {dt:7.2f} ms/ring  ({dt / N_CAMS:6.2f} ms/cam)",
              flush=True)
        return dt, out
    except Exception as e:  # noqa: BLE001
        print(f"{name:40s} FAILED: {type(e).__name__}: {str(e)[:240]}",
              flush=True)
        return None, None


def main():
    cfg = dc.replace(SAM_VIT_H, dtype="bfloat16")
    model = Sam(cfg)
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((64, 64, 3)), jnp.zeros((1, 4)))
    )["params"]
    params = jax.tree.map(
        lambda p: jnp.asarray(
            np.random.default_rng(1).standard_normal(p.shape) * 0.02,
            p.dtype),
        params)
    params = jax.device_put(params)

    rng = np.random.default_rng(0)
    xs = jnp.asarray(
        rng.standard_normal((N_CAMS, 1024, 1024, 3)).astype(np.float32)
    )

    def enc_chunked(b):
        assert N_CAMS % b == 0

        @jax.jit
        def run(p, x):
            def body(carry, xc):
                e = model.apply({"params": p}, xc, method=model.encode_image)
                return carry, e

            _, es = jax.lax.scan(body, 0, x.reshape(N_CAMS // b, b,
                                                    *x.shape[1:]))
            return es.reshape(N_CAMS, *es.shape[2:])

        return run

    ref = None
    for b in (1, 2, 3, 6):
        t, out = timeit(f"encode ring, chunk batch B={b}",
                        enc_chunked(b), params, xs)
        if out is None:
            continue
        if ref is None:
            ref = np.asarray(out, np.float32)
        else:
            d = np.abs(np.asarray(out, np.float32) - ref)
            print(f"  max|diff| vs B=1: {d.max():.5f} mean {d.mean():.6f}",
                  flush=True)


main()
