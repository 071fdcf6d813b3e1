"""Pallas medoid kernel vs numpy, in interpreter mode (CPU CI)."""

import numpy as np
import jax.numpy as jnp

from cm3d_tpu.kernels.medoid_pallas import medoid_distance_sums_pallas

RNG = np.random.default_rng(11)


def _ref_sums(pts, valid):
    p = pts * valid[:, None]
    d = np.sqrt(((p[:, None, :] - p[None, :, :]) ** 2).sum(-1))
    return (d * valid[None, :]).sum(1).astype(np.float32)


def test_pallas_medoid_sums_matches_numpy():
    r, k = 3, 512
    pts = RNG.uniform(-30, 30, (r, k, 3)).astype(np.float32)
    valid = RNG.random((r, k)) < 0.3
    got = np.asarray(
        medoid_distance_sums_pallas(jnp.asarray(pts), jnp.asarray(valid), interpret=True)
    )
    for i in range(r):
        ref = _ref_sums(pts[i].astype(np.float64), valid[i])
        np.testing.assert_allclose(got[i], ref, rtol=1e-5, atol=1e-2)


def test_pallas_medoid_sums_pads_k():
    # K not a multiple of the kernel tile
    r, k = 2, 300
    pts = RNG.uniform(-5, 5, (r, k, 3)).astype(np.float32)
    valid = RNG.random((r, k)) < 0.5
    got = np.asarray(
        medoid_distance_sums_pallas(jnp.asarray(pts), jnp.asarray(valid), interpret=True)
    )
    assert got.shape == (r, k)
    for i in range(r):
        ref = _ref_sums(pts[i].astype(np.float64), valid[i])
        np.testing.assert_allclose(got[i], ref, rtol=1e-5, atol=1e-2)
