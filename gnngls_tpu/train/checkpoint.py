"""Native pytree checkpoints (npz) with the reference checkpoint triad.

The reference saves ``{epoch, model_state_dict, optimizer_state_dict, loss,
val_loss}`` at best-val / periodic / final points (scripts/train.py:60-67,
145-158, 170) but has no resume path.  We keep the same triad and metadata and
add real resume: a checkpoint restores params, BN state, optimizer state and
the epoch counter.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "name", getattr(p, "idx", getattr(p, "key", p))))
                       for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_checkpoint(path, *, params, bn_state, opt_state=None, epoch=0,
                    loss=None, val_loss=None) -> None:
    blobs = {}
    trees = {"params": params, "bn_state": bn_state}
    if opt_state is not None:
        trees["opt_state"] = opt_state
    for name, tree in trees.items():
        for k, v in _flatten(tree).items():
            blobs[f"{name}::{k}"] = v
    meta = {"epoch": int(epoch),
            "loss": None if loss is None else float(loss),
            "val_loss": None if val_loss is None else float(val_loss)}
    blobs["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **blobs)


def load_checkpoint(path, *, params_like, bn_state_like, opt_state_like=None
                    ) -> Tuple[Any, Any, Any, Dict]:
    """Restore pytrees structured like the provided templates."""
    with np.load(path, allow_pickle=False) as z:
        blobs = {k: z[k] for k in z.files}
    meta = json.loads(bytes(blobs.pop("__meta__").tobytes()).decode())

    def restore(name, like):
        flat_like = _flatten(like)
        leaves_like, treedef = jax.tree_util.tree_flatten(like)
        stored = []
        for k in flat_like:
            arr = blobs[f"{name}::{k}"]
            stored.append(arr)
        # tree_flatten_with_path and tree_flatten agree on leaf order
        return jax.tree_util.tree_unflatten(
            treedef, [s.astype(l.dtype) if hasattr(l, "dtype") else s
                      for s, l in zip(stored, leaves_like)])

    params = restore("params", params_like)
    bn_state = restore("bn_state", bn_state_like)
    opt_state = None
    if opt_state_like is not None and any(k.startswith("opt_state::") for k in blobs):
        opt_state = restore("opt_state", opt_state_like)
    return params, bn_state, opt_state, meta
