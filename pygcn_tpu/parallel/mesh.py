"""Device-mesh helpers.

The reference has no distributed backend at all (its only parallelism is a
``multiprocessing.Pool`` fan-out of simulator runs, reference
``pygcn/rl-policy-generator.py:308-321``). Here scale-out is expressed the
TPU way: a named :class:`jax.sharding.Mesh`, sharding annotations, and XLA
collectives over ICI.

Axis conventions used across the framework:

- ``"graph"`` — node/edge partition axis (the graph-size scaling axis; the
  build's analog of sequence parallelism).
- ``"data"``  — batch axis for policy-sample / seed batching.
- ``"model"`` — tensor-parallel axis (Megatron col/row weight sharding in
  ``tp_gcn.py``; also splits SpMM feature columns).
- ``"pipe"``  — pipeline axis (GPipe microbatch streaming in ``pipeline.py``,
  one deep-GCN stage per device).
- ``"expert"`` — expert-parallel axis (top-1-gated MoE in ``moe.py``, one
  shard of experts per device).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_sizes: Sequence[int],
    axis_names: Sequence[str] = ("graph",),
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = int(np.prod(axis_sizes))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(tuple(axis_sizes))
    return Mesh(dev_array, tuple(axis_names))
