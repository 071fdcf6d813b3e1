"""On-chip A/B: Detic batch-6 forward in bf16 (fused window attention on)
vs bf16 + int8 w8a8 Swin MLPs (SwinConfig.quant_int8).

The Swin MLPs (fc1/fc2) are ~2/3 of each backbone block's Dense FLOPs and
sit outside the fused window-attention kernel, so the int8 path composes
with it. This measures the net batch-6 win and the detection deviation
(box/score deltas on the same input) at production geometry with random
production-scale weights — the decision input for whether --quant_int8
is worth recommending for the Detic half of the mask stage.

Run: python -c "exec(open('scripts/ab_detic_int8.py').read())"
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

from cm3d_tpu.models.detic import (
    DETIC_SWINB,
    DETIC_TEST,
    Detic,
    quantize_detic_params,
)
WARMUP, ITERS = (1, 1) if SMOKE else (2, 6)
BATCH = 2 if SMOKE else 6
H, W = (96, 128) if SMOKE else (576, 1024)
BASE = DETIC_TEST if SMOKE else DETIC_SWINB


def sync(x):
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def timeit(name, fn, *args):
    try:
        for _ in range(WARMUP):
            sync(fn(*args)[1])
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = fn(*args)
        sync(out[1])
        dt = (time.perf_counter() - t0) / ITERS * 1000
        print(f"{name:40s} {dt:7.2f} ms/batch-{BATCH}", flush=True)
        return dt, out
    except Exception as e:  # noqa: BLE001
        print(f"{name:40s} FAILED: {type(e).__name__}: {str(e)[:240]}",
              flush=True)
        return None, None


def main():
    rng = np.random.default_rng(2)
    cfg = dc.replace(
        BASE, dtype="bfloat16",
        swin=dc.replace(BASE.swin, dtype="bfloat16"),
    )
    model = Detic(cfg)
    n_vocab = 18
    clf = jnp.asarray(
        rng.standard_normal((cfg.embed_dim, n_vocab)).astype(np.float32)
    )
    img0 = jnp.zeros((H, W, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda r: model.init(r, img0, clf), jax.random.PRNGKey(0)
    )["params"]
    params = jax.tree.map(
        lambda p: jnp.asarray(rng.standard_normal(p.shape) * 0.02, p.dtype),
        shapes,
    )
    qcfg = dc.replace(
        cfg, swin=dc.replace(cfg.swin, dtype="bfloat16", quant_int8=True)
    )
    qmodel = Detic(qcfg)
    qparams = jax.device_put(quantize_detic_params(params))
    params = jax.device_put(params)

    xs = jnp.asarray(rng.standard_normal((BATCH, H, W, 3)).astype(np.float32))
    hw = jnp.tile(jnp.asarray([H, W], jnp.int32), (BATCH, 1))

    def make_fwd(m):
        @jax.jit
        def run(p, x, hw_b):
            def one(img, hw_c):
                det = m.apply({"params": p}, img, clf, hw_c)
                return det.boxes, det.scores, det.valid

            return jax.vmap(one)(x, hw_b)

        return run

    t_bf16, o_bf16 = timeit("detic batch-6, bf16", make_fwd(model),
                            params, xs, hw)
    t_int8, o_int8 = timeit("detic batch-6, int8 MLPs", make_fwd(qmodel),
                            qparams, xs, hw)
    if o_bf16 is None or o_int8 is None:
        return
    if t_bf16 and t_int8:
        print(f"speedup x{t_bf16 / t_int8:.3f}", flush=True)
    b_a, s_a, v_a = (np.asarray(o, np.float32) for o in o_bf16)
    b_b, s_b, v_b = (np.asarray(o, np.float32) for o in o_int8)
    print(f"valid dets bf16 {int((v_a > 0).sum())} int8 "
          f"{int((v_b > 0).sum())}", flush=True)
    # slot order reshuffles under score perturbation — match by nearest box
    near, dscore = [], []
    for img in range(BATCH):
        ai = np.where(v_a[img] > 0)[0]
        bi = np.where(v_b[img] > 0)[0]
        if len(ai) == 0 or len(bi) == 0:
            continue
        d = np.abs(b_a[img, ai][:, None] - b_b[img, bi][None]).max(-1)
        j = d.argmin(1)
        near.append(d[np.arange(len(ai)), j])
        dscore.append(np.abs(s_a[img, ai] - s_b[img, bi[j]]))
    if near:
        near = np.concatenate(near)
        dscore = np.concatenate(dscore)
        print(f"nearest-box |diff| median {np.median(near):.3f}px "
              f"p90 {np.percentile(near, 90):.3f}px max {near.max():.3f}px; "
              f"score |diff| max {dscore.max():.5f}", flush=True)


main()
