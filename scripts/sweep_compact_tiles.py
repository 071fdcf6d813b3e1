"""Sweep compact_rows_pallas (s_tile, l_tile) on the three lift call shapes.

MXU work ~ covered_S * (l_tile + sel_frac * s_tile) per row, so dense
selections should favor smaller tiles; this measures it on the chip.

Run: python -c "exec(open('scripts/sweep_compact_tiles.py').read())"
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from cm3d_tpu.kernels.compact_pallas import compact_rows_pallas

# (name, rows, D, S, limit, sel_frac) — batch-8 production lift shapes
SHAPES = [
    ("camera", 48, 5, 131072, 32768, 0.35),
    ("union", 48, 12, 32768, 8192, 0.25),
    ("mask", 1024, 4, 8192, 2048, 0.08),
]
TILES = [(2048, 512), (2048, 256), (1024, 512), (1024, 256), (1024, 128),
         (512, 256), (512, 128), (4096, 512)]


def sync(o):
    return float(np.asarray(jnp.sum(o)))


rng = np.random.default_rng(0)
for name, r, d, s, limit, frac in SHAPES:
    sel = jnp.asarray(rng.random((r, s)) < frac)
    vals = jnp.asarray(rng.standard_normal((r, d, s)).astype(np.float32))
    sel, vals = jax.device_put((sel, vals))
    ref = None
    print(f"--- {name}: R={r} D={d} S={s} L={limit} frac={frac}", flush=True)
    for s_t, l_t in TILES:
        f = jax.jit(lambda se, va, s_t=s_t, l_t=l_t: compact_rows_pallas(
            se, va, limit, s_tile=s_t, l_tile=l_t))
        try:
            out = f(sel, vals)
            got = np.asarray(out)
        except Exception as e:
            print(f"  s_t={s_t:5d} l_t={l_t:4d}  FAIL {str(e)[:80]}",
                  flush=True)
            continue
        if ref is None:
            ref = got
        else:
            np.testing.assert_array_equal(got, ref)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                out = f(sel, vals)
            sync(out)
            best = min(best, (time.perf_counter() - t0) / 10)
        print(f"  s_t={s_t:5d} l_t={l_t:4d}  {best*1000:7.2f} ms", flush=True)
