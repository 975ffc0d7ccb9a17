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


class AsyncSaver:
    """Non-blocking checkpoint writes (SURVEY.md §5.4 'async save'):
    save() returns as soon as the state is snapshotted; the write runs in
    the background. Call wait()/close() before reading the files back."""

    def __init__(self):
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, path: str, state: Any) -> None:
        self._ckptr.save(os.path.abspath(path),
                         args=ocp.args.StandardSave(state), force=True)

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._ckptr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def has_top_level_key(path: str, key: str) -> bool:
    """Whether the saved state dict carries ``key`` at its top level —
    lets resume adapt when the checkpoint's optional tracks (e.g.
    'ema_params') differ from the current run's template instead of
    dying on a pytree-structure mismatch."""
    path = os.path.abspath(path)
    try:
        with ocp.StandardCheckpointer() as ckptr:
            md = ckptr.metadata(path)
        tree = getattr(md, "item_metadata", None) or md
        return key in tree
    except Exception:
        # metadata API shape varies across orbax versions; fall back to
        # the _METADATA tree json. NOTE the old per-key-directory probe
        # was provably wrong for the OCDBT layout this orbax writes (no
        # per-key subtrees — it reported every key absent, silently
        # dropping e.g. the EMA track on resume; code-review finding).
        import json

        meta = os.path.join(path, "_METADATA")
        try:
            doc = json.load(open(meta))
        except (OSError, ValueError):
            # last resort: ancient layouts did write per-key subtrees
            return os.path.isdir(os.path.join(path, key))

        def walk(node) -> bool:
            if isinstance(node, dict):
                for k, v in node.items():
                    # keys appear verbatim or inside flattened
                    # keypath strings like "('ema_params', ...)"
                    if k == key or (isinstance(k, str)
                                    and f"'{key}'" in k):
                        return True
                    if walk(v):
                        return True
            elif isinstance(node, list):
                return any(walk(v) for v in node)
            return False

        return walk(doc)


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
