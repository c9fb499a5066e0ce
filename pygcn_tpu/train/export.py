"""AOT model export for serving — `jax.export` StableHLO artifacts.

The reference ships trained models by pickling the whole torch module
(``gnn-over-mlp.py:489``) and unpickling it in the policy scripts — which
requires the exact model code at load time. The TPU-native serving artifact
is instead the *compiled program*: ``jax.export`` serializes the jitted
forward (weights and graph closed over as constants) to StableHLO bytes
that reload and execute WITHOUT any pygcn_tpu model code — the
compile-once/serve-anywhere contract XLA is built for. Shapes are static
(fixed serving batch), so the loaded program never recompiles per request.
"""

from __future__ import annotations

import pickle
from typing import Any, Callable, Optional, Sequence

MAGIC = "pygcn_tpu-export-v1"


def export_forward(
    fn: Callable,
    example_args: Sequence,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize ``jit(fn)`` traced at ``example_args`` to StableHLO bytes.

    ``platforms`` (e.g. ``["tpu", "cpu"]``) widens the artifact beyond the
    exporting machine's backend; default = the current default platform.
    """
    import jax

    exp = jax.export.export(jax.jit(fn), platforms=platforms)(*example_args)
    return bytes(exp.serialize())


def deserialize_forward(blob: bytes) -> Callable:
    """Rehydrate a serialized forward; returns a callable of the original
    example-arg structure. Executes via ``jax.jit`` of the embedded program —
    no model source needed."""
    import jax

    exp = jax.export.deserialize(blob)
    return jax.jit(exp.call)


def save_artifact(path: str, fn: Callable, example_args: Sequence,
                  meta: Optional[dict] = None,
                  platforms: Optional[Sequence[str]] = None) -> None:
    """Write a self-contained serving artifact: StableHLO + metadata."""
    blob = export_forward(fn, example_args, platforms=platforms)
    with open(path, "wb") as f:
        pickle.dump({"magic": MAGIC, "stablehlo": blob, "meta": meta or {}}, f)


def load_artifact(path: str) -> tuple[Callable, dict[str, Any]]:
    """Load a serving artifact → (callable, meta)."""
    with open(path, "rb") as f:
        d = pickle.load(f)
    if d.get("magic") != MAGIC:
        raise ValueError(f"{path} is not a pygcn_tpu export artifact")
    return deserialize_forward(d["stablehlo"]), d["meta"]
