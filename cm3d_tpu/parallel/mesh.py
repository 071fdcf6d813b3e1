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
    if n_data <= 0 or n_model <= 0:
        raise ValueError(
            f"mesh axes must be positive, got data={n_data} model={n_model}"
        )
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh ({n_data} data x {n_model} model) exceeds "
            f"{len(devices)} available devices"
        )
    dev = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, axis_names=("data", "model"))


def dp_mesh(data_parallel: int, batch_size: int) -> Mesh:
    """The CLIs' --data_parallel contract in one place: validate N against
    the batch and the device count (clear SystemExit instead of a reshape
    error deep in mesh construction), then build the N-chip data mesh."""
    if data_parallel <= 0:
        raise SystemExit(
            f"--data_parallel must be positive, got {data_parallel}"
        )
    if batch_size % data_parallel:
        raise SystemExit(
            f"--data_parallel {data_parallel} must divide "
            f"--batch_size {batch_size}"
        )
    n_avail = len(jax.devices())
    if data_parallel > n_avail:
        raise SystemExit(
            f"--data_parallel {data_parallel} exceeds {n_avail} "
            f"available devices"
        )
    return make_mesh(n_data=data_parallel)


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated over the mesh (params/opt state in
    the pure-DP CLIs)."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def batch_spec(x) -> P:
    """Leading-dim-on-`data` spec for one batch leaf — the single
    definition of the batch-sharding convention (shard_batch places with
    it, pipeline.sharded_batch_step constrains with it)."""
    return P("data", *([None] * (np.ndim(x) - 1)))


def shard_batch(batch, mesh: Mesh):
    """Place a KeyframeBatch (or any pytree with leading batch dims) so the
    leading dim is sharded over the `data` axis and everything else is
    replicated."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, batch_spec(x))),
        batch,
    )
