"""Compaction kernel parity vs the top_k + gather reference (interpret)."""

import numpy as np
import jax
import jax.numpy as jnp

from cm3d_tpu.kernels.compact_pallas import compact_rows_pallas
from cm3d_tpu.ops.lift import _compact_topk

RNG = np.random.default_rng(0)


def _reference(sel, values, limit):
    ids, ok = _compact_topk(jnp.asarray(sel), limit)
    v = jnp.take_along_axis(jnp.asarray(values), ids[:, None, :], axis=2)
    return np.asarray(jnp.where(ok[:, None, :], v, 0.0))


def test_compact_rows_matches_topk_gather():
    r, s, d, limit = 5, 4096, 3, 1024
    sel = RNG.random((r, s)) < 0.3
    sel[1] = False                      # empty row
    sel[2] = True                       # full row (truncates at limit)
    sel[3, : s // 2] = False            # selection concentrated late
    values = RNG.standard_normal((r, d, s)).astype(np.float32)
    out = np.asarray(
        compact_rows_pallas(jnp.asarray(sel), jnp.asarray(values), limit,
                            interpret=True)
    )
    want = _reference(sel, values, limit)
    np.testing.assert_array_equal(out, want)  # EXACT (one-hot f32 matmul)


def test_compact_rows_int_ids_exact():
    """Integer payloads (point ids) survive the f32 matmul exactly."""
    r, s, limit = 2, 2048, 512
    sel = RNG.random((r, s)) < 0.5
    ids = RNG.integers(0, 1 << 23, (r, 1, s)).astype(np.float32)
    out = np.asarray(
        compact_rows_pallas(jnp.asarray(sel), jnp.asarray(ids), limit,
                            interpret=True)
    )
    want = _reference(sel, ids, limit)
    np.testing.assert_array_equal(out, want)
    assert (out == np.round(out)).all()


def test_compact_rows_under_vmap():
    b, r, s, d, limit = 3, 4, 2048, 2, 512
    sel = RNG.random((b, r, s)) < 0.25
    values = RNG.standard_normal((b, r, d, s)).astype(np.float32)
    out = np.asarray(
        jax.vmap(lambda se, va: compact_rows_pallas(se, va, limit,
                                                    interpret=True))(
            jnp.asarray(sel), jnp.asarray(values)
        )
    )
    for i in range(b):
        np.testing.assert_array_equal(out[i], _reference(sel[i], values[i], limit))
