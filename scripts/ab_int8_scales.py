"""Decide VERDICT r04 stretch item 8 on evidence: do the DYNAMIC per-token
activation scales in ops/quant.py cost real milliseconds vs a STATIC
(calibrated) scale at SAM-encode shapes?

Three jitted 8-layer Dense chains at ViT-H MLP geometry
(tokens 14x14x25 windows ~ 4900, d=1280, hidden=5120):
  bf16     — the float baseline the int8 path competes with;
  dynamic  — ops.quant.dynamic_int8_matmul (per-token amax each layer);
  static   — same s8xs8->s32 dot with a precomputed constant scale
             (what a calibration pass would bake), the amax/divide gone.

If static ~= dynamic, the calibration mode buys nothing on TPU (the VPU
amax fuses into the surrounding elementwise work) and the item closes as
measured-unnecessary; a real gap justifies implementing calibration.

Run: python -c "exec(open('scripts/ab_int8_scales.py').read())"
CM3D_AB_SMOKE=1: tiny shapes on CPU (plumbing).
"""

import os
import time

smoke = os.environ.get("CM3D_AB_SMOKE") == "1"

import jax  # noqa: E402

if smoke:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cm3d_tpu.ops.quant import dynamic_int8_matmul, quantize_weight  # noqa: E402

if smoke:
    T, D, H, L, reps = 64, 32, 128, 2, 2
else:
    T, D, H, L, reps = 4900, 1280, 5120, 8, 30

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(size=(T, D)).astype(np.float32))
ws = [
    (jnp.asarray(rng.normal(size=(D, H)).astype(np.float32) * 0.02),
     jnp.asarray(rng.normal(size=(H, D)).astype(np.float32) * 0.02))
    for _ in range(L)
]
wqs = [(quantize_weight(a), quantize_weight(b)) for a, b in ws]


# house rule: params are jit ARGUMENTS, never closure constants — baked
# weights blow the axon tunnel's remote-compile body limit (HTTP 413)
@jax.jit
def run_bf16_w(x, ws):
    for a, b in ws:
        h = jnp.maximum(x.astype(jnp.bfloat16) @ a.astype(jnp.bfloat16), 0)
        x = (h @ b.astype(jnp.bfloat16)).astype(jnp.float32)
    return jnp.sum(x)


def run_bf16(x):
    return run_bf16_w(x, ws)


@jax.jit
def run_dynamic_w(x, wqs):
    for (aq, asc), (bq, bsc) in wqs:
        h = jnp.maximum(dynamic_int8_matmul(x, aq, asc), 0)
        x = dynamic_int8_matmul(h, bq, bsc)
    return jnp.sum(x)


def run_dynamic(x):
    return run_dynamic_w(x, wqs)


def static_int8_matmul(x, w_q, w_scale, x_scale):
    # calibrated path: the scale is a baked CONSTANT, no amax pass;
    # clip because real activations can exceed the calibration range
    x_q = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, w_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * x_scale * w_scale


# "calibration": true per-layer amax of this input distribution
_cal = []
_x = np.asarray(x0)
for (a, b) in ws:
    _h = np.maximum(_x @ np.asarray(a), 0)
    _cal.append((float(np.abs(_x).max()) / 127.0,
                 float(np.abs(_h).max()) / 127.0))
    _x = _h @ np.asarray(b)


import functools


@functools.partial(jax.jit, static_argnums=2)
def run_static_w(x, wqs, cal):
    for ((aq, asc), (bq, bsc)), (sx, sh) in zip(wqs, cal):
        h = jnp.maximum(static_int8_matmul(x, aq, asc, sx), 0)
        x = static_int8_matmul(h, bq, bsc, sh)
    return jnp.sum(x)


def run_static(x):
    return run_static_w(x, wqs, tuple(_cal))


def bench(name, fn):
    float(np.asarray(fn(x0)))  # compile + sync
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(x0)
    float(np.asarray(out))  # host transfer = the only reliable sync
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:8s}: {dt:8.3f} ms/chain", flush=True)
    return dt


print(f"ab_int8_scales smoke={smoke} backend={jax.default_backend()} "
      f"T={T} D={D} H={H} L={L}", flush=True)
t_bf16 = bench("bf16", run_bf16)
t_dyn = bench("dynamic", run_dynamic)
t_static = bench("static", run_static)
print(f"dynamic-scale overhead vs static: "
      f"{(t_dyn - t_static):.3f} ms/chain "
      f"({(t_dyn / max(t_static, 1e-9) - 1) * 100:.1f}%)", flush=True)
