"""Quantify the SAM ViT-H windowed-block layout-copy cost: is the fused
window-attention kernel worth wiring into SAM's windowed blocks?

Times one windowed ViTBlock at production geometry (64x64 grid, C=1280)
three ways: full block, attention-only (no partition), and qkv+proj
matmuls only — the deltas bound what partition/layout copies cost.
Run: python -c "exec(open('scripts/profile_sam_windowed.py').read())"
"""

import dataclasses as dc
import time

import jax
import jax.numpy as jnp
import numpy as np

from cm3d_tpu.models.sam import SAM_VIT_H
from cm3d_tpu.models.sam import ViTBlock

GH = GW = 64  # 1024/16 token grid
WARMUP, ITERS = 2, 10


def sync(x):
    return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32))))


def timeit(name, fn, *args):
    for _ in range(WARMUP):
        sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(ITERS):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:40s} {dt:7.2f} ms", flush=True)
    return dt


def main():
    cfg = dc.replace(SAM_VIT_H, dtype="bfloat16")
    dt_ = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((1, GH, GW, cfg.encoder_dim)).astype(np.float32)
    ).astype(dt_)

    block = ViTBlock(
        cfg.encoder_dim, cfg.encoder_heads, cfg.window_size, (GH, GW), dt_
    )
    params = block.init(jax.random.PRNGKey(0), x)["params"]
    params = jax.tree.map(lambda p: jnp.full(p.shape, 0.01, p.dtype), params)
    f_block = jax.jit(lambda p, xi: block.apply({"params": p}, xi))
    t_block = timeit("windowed ViTBlock (full)", f_block, params, x)

    # matmul-only floor: LN + qkv + proj + MLP as plain dense chain on the
    # unpartitioned tokens (exactly the block's matmul FLOPs, no window
    # layout work, no attention)
    C = cfg.encoder_dim
    wqkv = params["attn"]["qkv"]["kernel"].astype(dt_)
    wproj = params["attn"]["proj"]["kernel"].astype(dt_)
    w1 = params["mlp"]["lin1"]["kernel"].astype(dt_) if "mlp" in params and "lin1" in params.get("mlp", {}) else None

    def f_matmuls(p, xi):
        t = xi.reshape(-1, C)
        qkv = t @ wqkv
        o = qkv[:, :C] @ wproj
        return o

    t_mm = timeit("qkv+proj matmuls only", jax.jit(f_matmuls), params, x)
    print(f"non-matmul overhead (attn + window layout): "
          f"{t_block - t_mm:.2f} ms/block x 28 blocks = "
          f"{(t_block - t_mm) * 28:.1f} ms/encode", flush=True)


main()
