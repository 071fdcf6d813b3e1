"""Converted-checkpoint persistence (orbax).

Torch->flax conversion is a one-time host-side cost; converted params are
saved as orbax checkpoints so production runs load device-ready trees
directly (and multi-host runs restore them sharded).
"""

from __future__ import annotations

import os
from typing import Any


def save_params(params: Any, path: str, overwrite: bool = False) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=overwrite)
    ckptr.wait_until_finished()


def load_params(path: str, like: Any | None = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(path, like)
    return ckptr.restore(path)
