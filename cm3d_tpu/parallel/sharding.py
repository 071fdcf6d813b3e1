"""Tensor sharding of the 2D models over the mesh's `model` axis.

SURVEY.md §2.4: the 2D stage (SAM ViT-H / Detic SwinB) fits one chip in
bf16, so pure data parallelism is the default; when batch-1 latency matters
the attention/MLP blocks shard Megatron-style over a small `model` axis —
column-parallel qkv/fc1, row-parallel proj/fc2, XLA inserting the
all-reduces over ICI.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, spec builder). Kernels are [in, out]; column-parallel layers
# split out, row-parallel layers split in. The int8 w8a8 variants
# (QuantDense: kernel_q [in, out] + kernel_scale [out], ops/quant.py)
# shard the same way — kernel_q like kernel, and the per-OUT-channel
# scale follows the out axis (sharded for column-parallel, replicated for
# row-parallel, where XLA all-reduces the int32 partials before the
# dequant multiply).
_RULES = [
    (r"(attn/qkv|in_proj|fc1|mlp_fc|lin1)/kernel(_q)?$", P(None, "model")),
    (r"(attn/qkv|in_proj|fc1|mlp_fc|lin1)/(bias|kernel_scale)$", P("model")),
    (r"(attn/proj|out_proj|fc2|mlp_proj|lin2)/kernel(_q)?$", P("model", None)),
]


def param_spec(path: str, ndim: int) -> P:
    for pattern, spec in _RULES:
        if re.search(pattern, path):
            # the FULL spec length must fit the array rank (a 2-axis spec
            # on a 1-D leaf makes device_put raise), not just the count of
            # sharded axes — P(None, 'model') has one sharded axis but
            # still needs a rank-2 array
            if len(spec) <= ndim:
                return spec
    return P()  # replicated


def shard_model_params(params: Any, mesh: Mesh) -> Any:
    """Place a flax params tree on the mesh under the rules above —
    exactly spec_tree's specs, so placement and spec queries can't drift."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, spec_tree(params),
    )


def make_sequence_sharded_encode(mesh: Mesh, model, params,
                                 axis: str = "model"):
    """GSPMD sequence parallelism for the SAM image encoder: the image's
    row axis (and with it the 64x64 token grid's row axis) shards over
    `axis`; params replicate. No hand-written collectives — XLA's SPMD
    partitioner propagates the sharding through patch-embed (halo
    exchange for the conv), the window-partition reshapes, and the
    global-attention blocks (all-gather over ICI), exactly the
    annotate-and-let-XLA-partition recipe the rest of cm3d_tpu.parallel
    uses. This is the batch-independent latency lever for when chips
    outnumber cameras (the camera-parallel mask stage covers the
    chips <= cameras regime).

    Returns encode(image [S,S,3]) -> embedding [S/p, S/p, C] with the
    token-row axis still sharded (np.asarray / downstream ops gather).
    """
    rep = NamedSharding(mesh, P())
    img_sh = NamedSharding(mesh, P(axis))
    # replicate ONCE at closure build: without this, every encode() call
    # would copy the whole param tree across the mesh to satisfy
    # in_shardings (a ~2.4 GB transfer per call for SAM ViT-H f32)
    params = jax.device_put(params, rep)

    fn = jax.jit(
        # encode_image is batched [B,H,W,3]; the helper's contract is one
        # camera image [H,W,3] (matching Sam.__call__), so batch in/out here
        lambda p, im: model.apply({"params": p}, im[None],
                                  method=model.encode_image)[0],
        in_shardings=(jax.tree.map(lambda _: rep, params), img_sh),
        out_shardings=img_sh,
    )
    return lambda image: fn(params, image)


def spec_tree(params: Any) -> Any:
    """The PartitionSpec pytree matching shard_model_params' placement."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = [
        param_spec(
            "/".join(e.key if hasattr(e, "key") else str(e) for e in p),
            x.ndim,
        )
        for p, x in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, specs)
