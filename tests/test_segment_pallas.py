"""Segment sum+max kernel + Pallas voxelization parity (interpret, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from cm3d_tpu.kernels.segment_pallas import segment_sum_max_pallas

RNG = np.random.default_rng(0)


def test_segment_sum_max_matches_numpy():
    r, n, d, c = 3, 4096, 5, 700  # n_cells not a tile multiple
    cell = np.sort(RNG.integers(0, c + 5, (r, n)), axis=1).astype(np.int32)
    vals = RNG.standard_normal((r, d, n)).astype(np.float32)
    mx = RNG.standard_normal((r, n)).astype(np.float32)
    # rows with sink id (>= c) must be ignorable: zero their values
    sink = cell >= c
    vals = np.where(sink[:, None, :], 0.0, vals)
    mx = np.where(sink, -np.inf, mx)

    sums, maxs = segment_sum_max_pallas(
        jnp.asarray(cell), jnp.asarray(vals), jnp.asarray(mx), c,
        interpret=True,
    )
    sums, maxs = np.asarray(sums), np.asarray(maxs)
    assert sums.shape == (r, d, c) and maxs.shape == (r, c)
    for i in range(r):
        for cc in np.unique(cell[i]):
            if cc >= c:
                continue
            m = cell[i] == cc
            # NOTE vals[i, :, m] would advanced-index to (count, d)
            np.testing.assert_allclose(
                sums[i, :, cc], vals[i][:, m].sum(axis=1),
                rtol=1e-5, atol=1e-5,
            )
            assert maxs[i, cc] == mx[i, m].max()
        empty = np.setdiff1d(np.arange(c), cell[i])
        assert (sums[i][:, empty] == 0).all()
        assert np.isneginf(maxs[i, empty]).all()


def test_pillarize_pallas_matches_scatter():
    """TPU-default sorted-segment path vs the scatter path (order-tolerant)."""
    import cm3d_tpu.train.voxelize as vox

    cfg = vox.PillarConfig(x_min=-12.8, x_max=12.8, y_min=-12.8, y_max=12.8,
                           resolution=0.8)
    pts = RNG.uniform(-14, 14, (3000, 4)).astype(np.float32)
    pts[:, 2] = RNG.uniform(-6, 4, 3000)  # some outside the z crop
    valid = RNG.random(3000) < 0.9
    outs = {}
    try:
        for mode in ("interpret", False):
            vox._USE_PALLAS_SEGMENT = mode
            outs[mode] = np.asarray(
                jax.jit(lambda p, v: vox.pillarize(p, v, cfg))(
                    jnp.asarray(pts), jnp.asarray(valid)
                )
            )
    finally:
        vox._USE_PALLAS_SEGMENT = None
    np.testing.assert_allclose(
        outs["interpret"], outs[False], rtol=1e-5, atol=1e-5
    )


def test_pillarize_pallas_under_vmap():
    import cm3d_tpu.train.voxelize as vox

    cfg = vox.PillarConfig(x_min=-6.4, x_max=6.4, y_min=-6.4, y_max=6.4,
                           resolution=0.8)
    pts = RNG.uniform(-7, 7, (2, 1500, 4)).astype(np.float32)
    valid = np.ones((2, 1500), bool)
    try:
        vox._USE_PALLAS_SEGMENT = "interpret"
        a = np.asarray(
            jax.vmap(lambda p, v: vox.pillarize(p, v, cfg))(
                jnp.asarray(pts), jnp.asarray(valid)
            )
        )
        vox._USE_PALLAS_SEGMENT = False
        b = np.asarray(
            jax.vmap(lambda p, v: vox.pillarize(p, v, cfg))(
                jnp.asarray(pts), jnp.asarray(valid)
            )
        )
    finally:
        vox._USE_PALLAS_SEGMENT = None
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_segment_sum_only_matches_sum_max_and_unbatched_cell():
    """The differentiable sum-only wrapper (no max stream) returns exactly
    the sum+max kernel's sums; a closed-over (unbatched) cell operand
    broadcasts under vmap instead of asserting."""
    import jax

    from cm3d_tpu.kernels.segment_pallas import (
        segment_sum_max_pallas,
        segment_sum_pallas,
    )

    rng = np.random.default_rng(5)
    r, n, d, n_cells = 3, 2048, 4, 600
    cell = np.sort(rng.integers(0, n_cells + 5, (r, n)), axis=1).astype(np.int32)
    values = rng.standard_normal((r, d, n)).astype(np.float32)
    maxvals = np.full((r, n), -np.inf, np.float32)

    sums_only = np.asarray(
        segment_sum_pallas(jnp.asarray(cell), jnp.asarray(values), n_cells,
                           True)
    )
    sums_ref, _ = segment_sum_max_pallas(
        jnp.asarray(cell), jnp.asarray(values), jnp.asarray(maxvals),
        n_cells, interpret=True,
    )
    np.testing.assert_array_equal(sums_only, np.asarray(sums_ref))

    cell_j = jnp.asarray(cell[0])
    batched = np.asarray(
        jax.vmap(
            lambda v: segment_sum_pallas(cell_j[None], v[None], n_cells,
                                         True)[0]
        )(jnp.asarray(values))
    )
    for i in range(r):
        want = np.asarray(
            segment_sum_pallas(
                jnp.asarray(cell[:1]), jnp.asarray(values[i : i + 1]),
                n_cells, True,
            )
        )[0]
        np.testing.assert_array_equal(batched[i], want)
