"""Orbax-backed distributed checkpointing (sharded save / reshard-on-restore).

The pickle checkpoints in ``checkpoint.py`` mirror the reference's
single-device ``save_checkpoint_state`` (``pygcn/utils.py:458-478``) and
gather everything to host. This module is the scale path: Orbax writes each
shard from its owning device (no host gather), saves asynchronously so the
train loop keeps stepping during I/O, and restores directly into a target
sharding — including a *different* mesh shape than the one that saved
(elastic resume: save on 8 devices, restore on 4).

API kept deliberately small::

    ckptr = OrbaxCheckpointer()                     # async by default
    ckptr.save(path, {"params": params, "opt": opt_state, "epoch": epoch})
    state = ckptr.restore(path, like=abstract_or_concrete_tree)
    ckptr.wait()                                    # join pending async saves
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class OrbaxCheckpointer:
    """Thin wrapper over ``ocp.StandardCheckpointer`` / ``AsyncCheckpointer``.

    ``async_save=True`` (default) returns from ``save`` as soon as device
    buffers are snapshotted; the filesystem write proceeds in the background
    (call ``wait()`` before reading the checkpoint back or exiting).
    """

    def __init__(self, async_save: bool = True):
        if async_save:
            self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        else:
            self._ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())

    def save(self, path: str, tree: Any, force: bool = True) -> None:
        """Save a pytree of (possibly sharded) jax.Arrays at ``path``."""
        self._ckptr.save(
            os.path.abspath(path), args=ocp.args.StandardSave(tree), force=force
        )

    def restore(self, path: str, like: Optional[Any] = None) -> Any:
        """Restore; ``like`` pins dtypes/shapes AND target shardings.

        Pass a pytree of ``jax.ShapeDtypeStruct(shape, dtype, sharding=...)``
        (or concrete arrays, whose specs are used) to restore each leaf
        directly into that sharding — the mesh may differ from the saving
        run's. With ``like=None`` leaves come back as numpy-backed arrays.
        """
        self.wait()
        if like is None:
            return self._ckptr.restore(os.path.abspath(path))
        abstract = jax.tree.map(
            lambda x: x
            if isinstance(x, jax.ShapeDtypeStruct)
            else jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None)),
            like,
        )
        return self._ckptr.restore(
            os.path.abspath(path), args=ocp.args.StandardRestore(abstract)
        )

    def wait(self) -> None:
        if hasattr(self._ckptr, "wait_until_finished"):
            self._ckptr.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._ckptr.close()
