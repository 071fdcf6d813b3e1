"""Multi-host input sharding.

SURVEY.md §2.4/§5: the only cross-host communication this workload needs is
input distribution — scenes split across hosts over DCN, keyframes across
each host's local chips over ICI. The reference's version of this was
hand-editing slice bounds in source (waymo/2d_to_3d.py:431).
"""

from __future__ import annotations

from typing import List, Sequence, TypeVar

import jax

T = TypeVar("T")


def shard_for_host(
    items: Sequence[T],
    process_index: int | None = None,
    process_count: int | None = None,
) -> List[T]:
    """Deterministic strided split of a work list across hosts.

    Strided (not contiguous) so scene-length skew balances; every host sees
    the same global ordering, which keeps resume manifests host-local.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(items[pi::pc])
