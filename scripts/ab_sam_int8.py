"""On-chip A/B: SAM ViT-H encode in bf16 vs int8 w8a8 Dense layers
(SamConfig.quant_int8 — ops/quant.py, models/common.QuantDense).

The encode is MXU-bound on its Dense layers (~92% of FLOPs); the int8 MXU
path runs s8xs8->s32 at 2x the bf16 peak on v5e+, so the expected ceiling
is ~2x on the Dense share. The dynamic per-token activation quantization
adds two VPU passes that should fuse into the surrounding elementwise work
— this script is the measurement that decides whether the flag is worth
offering as the mask-stage speed mode (and README-documents the deviation:
embedding cosine/max-dev and decoded-mask IoU vs the bf16 path at
production geometry with random production-scale weights).

Run: python -c "exec(open('scripts/ab_sam_int8.py').read())"
"""

import dataclasses as dc
import os
import time

# CM3D_AB_SMOKE=1: tiny-config CPU smoke (validates the script itself so an
# unattended queue run can't waste the tunnel window on a script bug).
# The CPU backend must be forced BEFORE the first backend init — the
# image's sitecustomize pre-selects axon, and a dead tunnel hangs forever.
SMOKE = bool(os.environ.get("CM3D_AB_SMOKE"))
if SMOKE:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if SMOKE:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from cm3d_tpu.models.sam import SAM_TEST, SAM_VIT_H, Sam, quantize_sam_params
WARMUP, ITERS = (1, 1) if SMOKE else (2, 6)
N_CAMS = 2 if SMOKE else 6
BASE = SAM_TEST if SMOKE else SAM_VIT_H
IMG = BASE.img_size


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
    rng = np.random.default_rng(1)
    f32cfg = dc.replace(BASE, dtype="bfloat16")
    model = Sam(f32cfg)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((64, 64, 3)), jnp.zeros((1, 4)))
    )["params"]
    params = jax.tree.map(
        lambda p: jnp.asarray(rng.standard_normal(p.shape) * 0.02, p.dtype),
        shapes,
    )
    qmodel = Sam(dc.replace(BASE, dtype="bfloat16", quant_int8=True))
    qparams = jax.device_put(quantize_sam_params(params))
    params = jax.device_put(params)

    xs = jnp.asarray(
        rng.standard_normal((N_CAMS, IMG, IMG, 3)).astype(np.float32)
    )
    boxes = jnp.asarray(
        np.stack([
            rng.uniform(0, IMG * 0.49, (16, 2)),
            rng.uniform(IMG * 0.51, IMG - 2, (16, 2)),
        ], axis=1).reshape(16, 4).astype(np.float32)
    )

    def make_scan(m):
        @jax.jit
        def run(p, x):
            def body(carry, xc):
                e = m.apply({"params": p}, xc[None],
                            method=m.encode_image)
                return carry, e[0]

            _, es = jax.lax.scan(body, 0, x)
            return es

        return run

    t_bf16, e_bf16 = timeit("encode ring, bf16", make_scan(model), params, xs)
    t_int8, e_int8 = timeit("encode ring, int8 w8a8", make_scan(qmodel),
                            qparams, xs)
    if e_bf16 is None or e_int8 is None:
        return
    a = np.asarray(e_bf16, np.float32)
    b = np.asarray(e_int8, np.float32)
    cos = float(
        (a.ravel() @ b.ravel())
        / max(1e-12, np.linalg.norm(a) * np.linalg.norm(b))
    )
    rel = float(np.linalg.norm(b - a) / max(1e-12, np.linalg.norm(a)))
    print(f"embedding cosine {cos:.6f}  rel |diff| {rel:.5f}", flush=True)
    if t_bf16 and t_int8:
        print(f"speedup x{t_bf16 / t_int8:.3f}", flush=True)

    # decoded-mask agreement through the (unquantized) decoder
    @jax.jit
    def dec(p, e, bx):
        logits, _ = model.apply({"params": p}, e, bx,
                                method=model.decode_boxes)
        return logits

    m_a = np.asarray(dec(params, e_bf16[0], boxes), np.float32) > 0
    m_b = np.asarray(dec(params, e_int8[0], boxes), np.float32) > 0
    union = (m_a | m_b).sum()
    iou = (m_a & m_b).sum() / union if union else 1.0
    print(f"decoded mask IoU (16 boxes, cam0): {iou:.4f} "
          f"(pos frac bf16 {m_a.mean():.4f})", flush=True)


main()
