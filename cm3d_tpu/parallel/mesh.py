"""Device mesh helpers.

The workload is embarrassingly parallel over keyframes (SURVEY.md §2.4): the
reference's authors sharded by hand-editing slice bounds in source; here a
1-D `data` mesh axis shards the keyframe batch, and a `model` axis is
available for tensor-sharding the 2D models (SAM ViT-H) when batch-1 latency
matters.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh. Defaults to all devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    dev = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, axis_names=("data", "model"))


def shard_batch(batch, mesh: Mesh):
    """Place a KeyframeBatch (or any pytree with leading batch dims) so the
    leading dim is sharded over the `data` axis and everything else is
    replicated."""
    def put(x):
        spec = P("data", *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)
