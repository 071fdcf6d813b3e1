"""Pipeline parallelism (parallel/gpipe.py): GPipe schedule parity.

The executor must be a pure re-scheduling: for any homogeneous layer
stack, pipeline_apply == sequential apply exactly (same ops, same order
per microbatch — only the device placement changes), and its GRADIENTS
must match too (the training-step building block).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cm3d_tpu.models.clip_text import ResidualAttentionBlock
from cm3d_tpu.parallel.gpipe import (
    make_pipeline_fn,
    stack_layer_params,
    stage_mesh,
)

# multi-minute model-family/pipeline integration file — excluded from the
# dev tier (`-m "not slow"`); the full suite runs everything
pytestmark = pytest.mark.slow

WIDTH, HEADS, CTX = 16, 2, 8


def _blocks_and_params(n_layers: int, seed: int = 0):
    block = ResidualAttentionBlock(WIDTH, HEADS)
    x0 = jnp.zeros((2, CTX, WIDTH))
    mask = jnp.triu(jnp.full((CTX, CTX), -jnp.inf), k=1)
    keys = jax.random.split(jax.random.PRNGKey(seed), n_layers)
    params = [block.init(k, x0, mask)["params"] for k in keys]
    return block, params, mask


def _sequential(block, params, x, mask):
    for p in params:
        x = block.apply({"params": p}, x, mask)
    return x


def _stage_mesh(n_stages: int):
    return stage_mesh(n_stages)


def _make_stage_fn(block, layers_per_stage, mask):
    def stage_fn(p, x):
        # each stage scans its OWN sub-stack of layers ([Lps, ...] leaves)
        def body(h, lp):
            return block.apply({"params": lp}, h, mask), None

        return jax.lax.scan(body, x, p)[0]

    del layers_per_stage
    return stage_fn


@pytest.mark.parametrize("n_stages,n_layers,n_micro", [(2, 4, 3), (4, 4, 5)])
def test_pipeline_matches_sequential(n_stages, n_layers, n_micro):
    block, params, mask = _blocks_and_params(n_layers)
    lps = n_layers // n_stages
    stacked = stack_layer_params(
        [stack_layer_params(params[i * lps:(i + 1) * lps])
         for i in range(n_stages)]
    )  # leaves [S, Lps, ...]
    mesh = _stage_mesh(n_stages)
    run = make_pipeline_fn(mesh, _make_stage_fn(block, lps, mask),
                           axis="stage")

    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(n_micro, 2, CTX, WIDTH)).astype(np.float32))
    got = jax.jit(run)(stacked, x)
    want = jnp.stack([_sequential(block, params, xi, mask) for xi in x])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_gradients_match_sequential():
    n_stages, n_layers, n_micro = 2, 4, 3
    block, params, mask = _blocks_and_params(n_layers, seed=3)
    lps = n_layers // n_stages
    stacked = stack_layer_params(
        [stack_layer_params(params[i * lps:(i + 1) * lps])
         for i in range(n_stages)]
    )
    mesh = _stage_mesh(n_stages)
    run = make_pipeline_fn(mesh, _make_stage_fn(block, lps, mask),
                           axis="stage")
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(n_micro, 2, CTX, WIDTH)).astype(np.float32))

    def loss_pp(sp, x):
        y = run(sp, x)
        return jnp.sum(y * y)

    def loss_seq(params, x):
        y = jnp.stack([_sequential(block, params, xi, mask) for xi in x])
        return jnp.sum(y * y)

    lp, gp = jax.value_and_grad(loss_pp)(stacked, x)
    ls, gs = jax.value_and_grad(loss_seq)(params, x)
    np.testing.assert_allclose(float(lp), float(ls), rtol=1e-5)
    # re-stack the sequential grads into the pipeline layout
    gs_stacked = stack_layer_params(
        [stack_layer_params(gs[i * lps:(i + 1) * lps])
         for i in range(n_stages)]
    )
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(gp),
        jax.tree_util.tree_leaves_with_path(gs_stacked),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=str(kp))


def test_pipeline_composes_with_data_parallelism():
    """dp x pp on one 2-D (data=2, stage=2) mesh: forward AND gradients
    match sequential — the shard_map transpose supplies the data-axis
    all-reduce of the (row-replicated) param cotangents."""
    n_stages, n_layers, n_micro, n_data, batch = 2, 4, 3, 2, 4
    block, params, mask = _blocks_and_params(n_layers, seed=5)
    lps = n_layers // n_stages
    stacked = stack_layer_params(
        [stack_layer_params(params[i * lps:(i + 1) * lps])
         for i in range(n_stages)]
    )
    mesh = stage_mesh(n_stages, n_data=n_data)
    assert dict(mesh.shape) == {"data": n_data, "stage": n_stages}
    run = make_pipeline_fn(mesh, _make_stage_fn(block, lps, mask),
                           axis="stage", batch_axis="data")

    x = jnp.asarray(np.random.default_rng(6).normal(
        size=(n_micro, batch, CTX, WIDTH)).astype(np.float32))
    got = jax.jit(run)(stacked, x)
    want = jnp.stack([_sequential(block, params, xi, mask) for xi in x])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    def loss_pp(sp):
        y = run(sp, x)
        return jnp.sum(y * y)

    def loss_seq(ps):
        y = jnp.stack([_sequential(block, ps, xi, mask) for xi in x])
        return jnp.sum(y * y)

    lp, gp = jax.value_and_grad(loss_pp)(stacked)
    ls, gs = jax.value_and_grad(loss_seq)(params)
    np.testing.assert_allclose(float(lp), float(ls), rtol=1e-5)
    gs_stacked = stack_layer_params(
        [stack_layer_params(gs[i * lps:(i + 1) * lps])
         for i in range(n_stages)]
    )
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(gp),
        jax.tree_util.tree_leaves_with_path(gs_stacked),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=str(kp))


def test_pipeline_rejects_unknown_batch_axis():
    block, params, mask = _blocks_and_params(2)
    mesh = _stage_mesh(2)
    with pytest.raises(ValueError, match="no 'data' axis"):
        make_pipeline_fn(mesh, _make_stage_fn(block, 1, mask),
                         batch_axis="data")


def test_pipeline_validates_data_sharding_preconditions():
    """With batch_axis set, x must be rank >= 2 with dim 1 divisible by
    the data-axis size — friendly ValueErrors, not opaque GSPMD
    failures."""
    n_stages, n_layers, n_data = 2, 2, 2
    block, params, mask = _blocks_and_params(n_layers, seed=7)
    stacked = stack_layer_params(
        [stack_layer_params(params[i:i + 1]) for i in range(n_stages)]
    )
    mesh = stage_mesh(n_stages, n_data=n_data)
    run = make_pipeline_fn(mesh, _make_stage_fn(block, 1, mask),
                           axis="stage", batch_axis="data")

    with pytest.raises(ValueError, match="rank >= 2"):
        run(stacked, jnp.zeros((4,)))
    with pytest.raises(ValueError, match="divide evenly"):
        run(stacked, jnp.zeros((2, 3, CTX, WIDTH)))


def test_pipeline_validates_stage_count():
    block, params, mask = _blocks_and_params(2)
    mesh = _stage_mesh(2)
    run = make_pipeline_fn(mesh, _make_stage_fn(block, 1, mask))
    bad = stack_layer_params([stack_layer_params([p]) for p in params[:1]])
    with pytest.raises(ValueError, match="leading dims"):
        run(bad, jnp.zeros((2, 2, CTX, WIDTH)))
    with pytest.raises(ValueError, match="no 'pp' axis"):
        make_pipeline_fn(mesh, _make_stage_fn(block, 1, mask), axis="pp")
