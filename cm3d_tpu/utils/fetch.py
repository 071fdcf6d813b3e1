"""Batched device->host transfers.

On the axon-tunneled TPU every host transfer pays a ~28 ms round trip,
and `jax.tree.map(np.asarray, tree)` / per-array `np.asarray` loops pay
it PER LEAF — measured 161 ms for a 6-leaf boxes tree vs 30 ms for one
`jax.device_get` of the whole tree (scripts/ab_download_batch.py,
TPU_QUEUE_r05). `device_fetch` is the one way the pipelines download
result pytrees: jax.Array leaves go through a single batched device_get;
anything else (numpy already on host, or bench content-swap _Lazy
wrappers whose __array__ syncs a real device output) falls back to
np.asarray per leaf.
"""

from __future__ import annotations

import numpy as np


def device_fetch(tree):
    """Download a pytree to host numpy in (at most) one batched transfer
    for all jax.Array leaves."""
    import jax

    leaves, treedef = jax.tree.flatten(tree)
    dev_idx = [i for i, x in enumerate(leaves) if isinstance(x, jax.Array)]
    if dev_idx:
        got = jax.device_get([leaves[i] for i in dev_idx])
        for i, g in zip(dev_idx, got):
            leaves[i] = g
    leaves = [x if isinstance(x, np.ndarray) else np.asarray(x)
              for x in leaves]
    return jax.tree.unflatten(treedef, leaves)
