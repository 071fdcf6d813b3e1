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
# split out, row-parallel layers split in.
_RULES = [
    (r"(attn/qkv|in_proj|fc1|mlp_fc|lin1)/kernel$", P(None, "model")),
    (r"(attn/qkv|in_proj|fc1|mlp_fc|lin1)/bias$", P("model")),
    (r"(attn/proj|out_proj|fc2|mlp_proj|lin2)/kernel$", P("model", None)),
]


def param_spec(path: str, ndim: int) -> P:
    for pattern, spec in _RULES:
        if re.search(pattern, path):
            if len([a for a in spec if a is not None]) <= ndim:
                return spec
    return P()  # replicated


def shard_model_params(params: Any, mesh: Mesh) -> Any:
    """Place a flax params tree on the mesh under the rules above."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def place(path_entries, x):
        path = "/".join(
            e.key if hasattr(e, "key") else str(e) for e in path_entries
        )
        spec = param_spec(path, x.ndim)
        return jax.device_put(x, NamedSharding(mesh, spec))

    leaves, treedef = jax.tree_util.tree_flatten(params)
    placed = [place(p, x) for p, x in flat]
    return jax.tree_util.tree_unflatten(treedef, placed)


def spec_tree(params: Any) -> Any:
    """The PartitionSpec pytree matching shard_model_params' placement."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    leaves, treedef = jax.tree_util.tree_flatten(params)
    specs = []
    for path_entries, x in flat:
        path = "/".join(
            e.key if hasattr(e, "key") else str(e) for e in path_entries
        )
        specs.append(param_spec(path, x.ndim))
    return jax.tree_util.tree_unflatten(treedef, specs)
