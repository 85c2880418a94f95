"""Checkpoint / resume for trainer state.

The reference has no persistence beyond GloVe's word2vec text export and the
in-memory best-weight snapshot (SURVEY.md §5 "Checkpoint / resume").  Here a
checkpoint is a single ``.npz`` holding a flattened pytree: embedding
tables, optimizer state (Adam moments / AdaGrad accumulators), and the epoch
counter — enough to resume a killed ``fit`` exactly where it left off.

npz is deliberate: single-host-readable, no orbax async machinery needed at
these table sizes (the largest supported config, ML-20M d=256, is ~140 MB
per table).  The format is a plain dict of arrays with ``/``-joined pytree
paths, so it round-trips through numpy alone.
"""

from __future__ import annotations

import os
import tempfile
from typing import Any, Dict, Tuple

import jax
import numpy as np

_EPOCH_KEY = "__epoch__"
_META_PREFIX = "__meta__/"


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_checkpoint(path: str, state: Any, epoch: int,
                    meta: Dict[str, Any] | None = None) -> None:
    """Atomically write ``state`` (a pytree of arrays) + epoch to ``path``."""
    flat = _flatten(state)
    flat[_EPOCH_KEY] = np.asarray(epoch, np.int64)
    for k, v in (meta or {}).items():
        flat[_META_PREFIX + k] = np.asarray(v)
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **flat)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_checkpoint(path: str, like: Any) -> Tuple[Any, int, Dict[str, Any]]:
    """Load a checkpoint into the structure of ``like`` (same pytree).

    Returns (state, epoch, meta).  Leaves keep ``like``'s shardings when
    ``like`` holds jax arrays (device_put with matching sharding).
    """
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    epoch = int(flat.pop(_EPOCH_KEY, -1))
    meta = {k[len(_META_PREFIX):]: flat.pop(k)
            for k in list(flat) if k.startswith(_META_PREFIX)}

    leaves_like, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for path_elems, leaf in leaves_like:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path_elems)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = flat[key]
        if hasattr(leaf, "sharding"):
            arr = jax.device_put(arr.astype(leaf.dtype), leaf.sharding)
        leaves.append(arr)
    state = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like), leaves)
    return state, epoch, meta
