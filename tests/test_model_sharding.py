"""Tensor-sharded SAM forward matches the unsharded one on the CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cm3d_tpu.models.sam import SAM_TEST, Sam
from cm3d_tpu.parallel.mesh import make_mesh
from cm3d_tpu.parallel.sharding import param_spec, shard_model_params


def test_param_spec_rules():
    assert param_spec("image_encoder/block0/attn/qkv/kernel", 2) == P(None, "model")
    assert param_spec("image_encoder/block0/attn/proj/kernel", 2) == P("model", None)
    assert param_spec("block1/mlp/lin1/kernel", 2) == P(None, "model")
    assert param_spec("block1/mlp/lin2/kernel", 2) == P("model", None)
    assert param_spec("pos_embed", 4) == P()
    assert param_spec("neck_conv1/kernel", 4) == P()


def test_sharded_sam_matches_unsharded():
    cfg = SAM_TEST
    model = Sam(cfg)
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((cfg.img_size, cfg.img_size, 3)).astype(np.float32))
    boxes = jnp.asarray(np.array([[4, 4, 30, 40], [8, 8, 20, 28]], np.float32))
    params = model.init(jax.random.PRNGKey(0), img, boxes)["params"]

    ref_masks, ref_iou = model.apply({"params": params}, img, boxes)

    mesh = make_mesh(n_data=4, n_model=2)
    sharded = shard_model_params(params, mesh)
    # verify something actually sharded over 'model'
    qkv = sharded["image_encoder"]["block0"]["attn"]["qkv"]["kernel"]
    assert "model" in str(qkv.sharding.spec)

    fwd = jax.jit(lambda p, i, b: model.apply({"params": p}, i, b))
    with mesh:
        masks, iou = fwd(sharded, img, boxes)
    np.testing.assert_allclose(np.asarray(masks), np.asarray(ref_masks),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(iou), np.asarray(ref_iou),
                               rtol=2e-4, atol=2e-4)
