"""Pallas medoid kernel vs numpy, in interpreter mode (CPU CI).

Contract: valid points are compacted to the FRONT of each row (the lift's
order-preserving top_k guarantees this); the kernel skips row tiles beyond
each set's count.
"""

import numpy as np
import jax.numpy as jnp

from cm3d_tpu.kernels.medoid_pallas import medoid_distance_sums_pallas

RNG = np.random.default_rng(11)


def _ref_sums(pts, valid):
    p = pts * valid[:, None]
    d = np.sqrt(((p[:, None, :] - p[None, :, :]) ** 2).sum(-1))
    return (d * valid[None, :]).sum(1).astype(np.float32)


def _front_valid(r, k, counts):
    valid = np.zeros((r, k), bool)
    for i, c in enumerate(counts):
        valid[i, :c] = True
    return valid


def test_pallas_medoid_sums_matches_numpy():
    r, k = 4, 512
    counts = [512, 300, 37, 0]  # full, partial tile, tiny, empty
    pts = RNG.uniform(-30, 30, (r, k, 3)).astype(np.float32)
    valid = _front_valid(r, k, counts)
    got = np.asarray(
        medoid_distance_sums_pallas(jnp.asarray(pts), jnp.asarray(valid), interpret=True)
    )
    for i, c in enumerate(counts):
        ref = _ref_sums(pts[i].astype(np.float64), valid[i])
        # only the first `count` rows are meaningful (argmin is masked there)
        np.testing.assert_allclose(got[i, :c], ref[:c], rtol=1e-5, atol=1e-2)


def test_pallas_medoid_sums_pads_k():
    # K not a multiple of the kernel tile
    r, k = 2, 300
    counts = [300, 123]
    pts = RNG.uniform(-5, 5, (r, k, 3)).astype(np.float32)
    valid = _front_valid(r, k, counts)
    got = np.asarray(
        medoid_distance_sums_pallas(jnp.asarray(pts), jnp.asarray(valid), interpret=True)
    )
    assert got.shape == (r, k)
    for i, c in enumerate(counts):
        ref = _ref_sums(pts[i].astype(np.float64), valid[i])
        np.testing.assert_allclose(got[i, :c], ref[:c], rtol=1e-5, atol=1e-2)
