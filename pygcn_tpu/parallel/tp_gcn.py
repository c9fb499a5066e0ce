"""Tensor-parallel GCN over a 2-D ``graph x model`` mesh.

Adds the model/TP axis to the parallelism matrix (the reference is strictly
single-device, ``pygcn/train.py:30``; graph and data axes live in
``dist_gcn.py`` / ``dist_evaluator.py``). Weights are sharded Megatron-style
in column/row pairs:

- **col layer** (even): ``W [F, H]`` sharded ``P(None, "model")`` — the local
  matmul produces a *column-sharded* activation with no communication, and
  the halo-exchange SpMM runs on the column shard (``col_axis="model"``:
  every per-device op in ``dist_spmm`` is column-independent, so the model
  axis splits SpMM work too, and the halo all_to_all moves only ``H/tp``
  columns).
- **row layer** (odd): ``W [H, F'] `` sharded ``P("model", None)`` — SpMM
  first on the column-sharded input, then the matmul contracts the sharded
  dimension; XLA inserts the one all-reduce of the pair (psum over
  ``"model"``), yielding a replicated activation.

The last layer keeps a replicated weight (class/output dims are small and
rarely divisible by the TP degree): if its input is column-sharded it uses
the row-layer op shape, otherwise SpMM runs with replicated columns.

Activations stay row-sharded over ``"graph"`` throughout, so this composes
TP with the graph partition: each SpMM is simultaneously row-sharded
(halo exchange over ICI) and column-sharded (model axis). Gradients need no
extra machinery — XLA derives the reverse halo exchange, and the VJP of the
row-layer psum is the col-layer's no-comm pattern (and vice versa), exactly
the Megatron backward.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pygcn_tpu.nn import init as tinit
from pygcn_tpu.parallel.dist_spmm import make_dist_spmm, pad_node_features
from pygcn_tpu.parallel.partition import DistPlan


class TPDistGCN:
    """N-layer GCN with tensor-parallel weights over ``graph x model``.

    ``dims = [f_in, h1, ..., f_out]``. Hidden dims consumed by col layers
    must be divisible by the model-axis size. Parameter *values* are
    identical to ``DistGCN`` (init is sharding-agnostic), so the same seed
    produces the same model at any TP degree.
    """

    def __init__(
        self,
        mesh: Mesh,
        plan: DistPlan,
        dims: Sequence[int],
        final_activation: Optional[Callable] = None,
        axis_graph: str = "graph",
        axis_model: str = "model",
    ):
        self.mesh = mesh
        self.plan = plan
        self.dims = list(dims)
        self.final_activation = final_activation
        self.axis_graph = axis_graph
        self.axis_model = axis_model
        tp = mesh.shape[axis_model]
        n_layers = len(self.dims) - 1

        # layer i mode: 'col' / 'row' alternate; the last layer keeps a
        # replicated weight ('rowfull' when its input is column-sharded,
        # 'full' when it is replicated)
        self.modes: List[str] = []
        for i in range(n_layers):
            if i < n_layers - 1:
                self.modes.append("col" if i % 2 == 0 else "row")
            else:
                self.modes.append("rowfull" if i % 2 == 1 else "full")
        for i, mode in enumerate(self.modes):
            if mode == "col" and self.dims[i + 1] % tp != 0:
                raise ValueError(
                    f"layer {i} output dim {self.dims[i + 1]} not divisible "
                    f"by model-axis size {tp}"
                )

        self.spmm_tp = make_dist_spmm(mesh, plan, axis_graph, col_axis=axis_model)
        self.spmm_rep = make_dist_spmm(mesh, plan, axis_graph)

    def init(self, key) -> list:
        params = []
        keys = jax.random.split(key, len(self.dims) - 1)
        for k, (fi, fo) in zip(keys, zip(self.dims[:-1], self.dims[1:])):
            kw, kb = jax.random.split(k)
            params.append({
                "w": tinit.graphconv_weight(kw, fi, fo),
                "b": tinit.graphconv_bias(kb, fo),
            })
        return params

    def param_specs(self) -> list:
        """PartitionSpec pytree matching ``init``'s structure."""
        m = self.axis_model
        specs = []
        for mode in self.modes:
            if mode == "col":
                specs.append({"w": P(None, m), "b": P(m)})
            elif mode == "row":
                specs.append({"w": P(m, None), "b": P()})
            else:  # replicated last-layer weight
                specs.append({"w": P(), "b": P()})
        return specs

    def apply(self, params, x):
        h = x  # [N_pad, F] sharded P(graph, None)
        n_layers = len(params)
        for i, (p, mode) in enumerate(zip(params, self.modes)):
            if mode == "col":
                # no-comm local matmul -> column-sharded SpMM
                h = self.spmm_tp(jnp.dot(h, p["w"])) + p["b"]
            elif mode in ("row", "rowfull"):
                # SpMM on the column shard, then the contraction over the
                # sharded dim (XLA inserts the psum over "model")
                h = jnp.dot(self.spmm_tp(h), p["w"]) + p["b"]
            else:  # 'full': replicated input and weight
                h = self.spmm_rep(jnp.dot(h, p["w"])) + p["b"]
            if i < n_layers - 1:
                h = jax.nn.relu(h)
            elif self.final_activation is not None:
                h = self.final_activation(h)
        return h

    # ---- sharding helpers -------------------------------------------------
    def shard_params(self, params):
        return jax.tree.map(
            lambda leaf, spec: jax.device_put(leaf, NamedSharding(self.mesh, spec)),
            params, self.param_specs(),
            is_leaf=lambda leaf: isinstance(leaf, jax.Array),
        )

    def shard_x(self, x):
        x = pad_node_features(jnp.asarray(x), self.plan)
        return jax.device_put(
            x, NamedSharding(self.mesh, P(self.axis_graph, None))
        )
