"""Training checkpoints via orbax (SURVEY.md §5.4): the TPU-native
equivalent of the reference's TF Saver checkpoints, plus darknet
``.weights`` import/export for interop (io/darknet_weights.py)."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save(path: str, state: Any) -> None:
    """Save a train-state pytree (blocking)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def restore(path: str, abstract_state: Optional[Any] = None) -> Any:
    """Restore a pytree; pass a matching abstract/concrete state to pin
    structure, shardings and dtypes."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if abstract_state is not None:
            target = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                            abstract_state)
            return ckptr.restore(path, target)
        return ckptr.restore(path)
