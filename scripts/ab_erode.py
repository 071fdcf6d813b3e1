"""On-chip A/B of erode3x3_packed formulations (batch 8, production canvas).

Run: python -c "exec(open('scripts/ab_erode.py').read())"
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from cm3d_tpu.ops.bitmask import erode3x3_packed

B, W, H, MW = 8, 1024, 576, 4
rng = np.random.default_rng(0)
x = jax.device_put(
    jnp.asarray(rng.integers(0, 2**32, (B, W, H, MW), dtype=np.uint64)
                .astype(np.uint32))
)
FULL = jnp.uint32(0xFFFFFFFF)


def erode_reduce_window(words):
    return jax.lax.reduce_window(
        words, FULL, jax.lax.bitwise_and,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def erode_separable(words):
    def sh(arr, axis, by):
        pad = [(0, 0)] * arr.ndim
        sl = [slice(None)] * arr.ndim
        pad[axis] = (by, 0) if by > 0 else (0, -by)
        sl[axis] = slice(0, arr.shape[axis]) if by > 0 else slice(
            -by, arr.shape[axis] - by)
        return jnp.pad(arr, pad, constant_values=FULL)[tuple(sl)]

    t = words & sh(words, 2, 1) & sh(words, 2, -1)
    return t & sh(t, 1, 1) & sh(t, 1, -1)


def sync(o):
    return float(np.asarray(jnp.sum(o.astype(jnp.uint32) & 1)))


fns = {
    "current9tap": jax.jit(jax.vmap(erode3x3_packed)),
    "reduce_window": jax.jit(erode_reduce_window),
    "separable": jax.jit(erode_separable),
}
ref = np.asarray(fns["current9tap"](x))
for name, f in fns.items():
    got = np.asarray(f(x))
    assert (got == ref).all(), name
print("all parities OK", flush=True)

for rep in range(3):
    for name, f in fns.items():
        sync(f(x))
        t0 = time.perf_counter()
        for _ in range(20):
            o = f(x)
        sync(o)
        print(f"rep{rep} {name:14s} {(time.perf_counter()-t0)/20*1000:7.2f} "
              f"ms/batch", flush=True)
