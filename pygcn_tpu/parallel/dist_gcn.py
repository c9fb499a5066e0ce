"""Distributed GCN layers/models over an edge-partitioned mesh.

Composes the halo-exchange SpMM (``dist_spmm``) with replicated layer weights:
activations are row-sharded over the ``"graph"`` axis, parameters replicated,
and XLA inserts the gradient all-reduce for ``dW`` and the reverse halo
exchange for ``dX`` automatically under ``jit``.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pygcn_tpu.nn import init as tinit
from pygcn_tpu.parallel.dist_spmm import make_dist_spmm, pad_node_features
from pygcn_tpu.parallel.partition import DistPlan


class DistGCN:
    """N-layer GCN over a distributed graph.

    ``dims = [f_in, h1, ..., f_out]``; ReLU between layers, optional final
    activation (e.g. ``jax.nn.log_softmax`` for classification).
    """

    def __init__(
        self,
        mesh: Mesh,
        plan: DistPlan,
        dims: Sequence[int],
        final_activation: Optional[Callable] = None,
        axis: str = "graph",
        remat: bool = False,
    ):
        self.mesh = mesh
        self.plan = plan
        self.dims = list(dims)
        self.final_activation = final_activation
        self.spmm = make_dist_spmm(mesh, plan, axis)
        self.axis = axis
        layer = lambda p, h: self.spmm(jnp.dot(h, p["w"])) + p["b"]
        # rematerialize per-layer activations in the backward pass (redo the
        # layer's SpMM + GEMM instead of keeping [N_pad, H] per layer live)
        self._layer = jax.checkpoint(layer) if remat else layer

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

    def apply(self, params, x):
        h = x
        n_layers = len(params)
        for i, p in enumerate(params):
            h = self._layer(p, h)
            if i < n_layers - 1:
                h = jax.nn.relu(h)
            elif self.final_activation is not None:
                h = self.final_activation(h)
        return h

    def shard_params(self, params):
        return jax.device_put(params, NamedSharding(self.mesh, P()))

    def shard_x(self, x):
        x = pad_node_features(jnp.asarray(x), self.plan)
        return jax.device_put(x, NamedSharding(self.mesh, P(self.axis, None)))


def make_dist_classifier_step(model: DistGCN, optimizer):
    """Jitted full-batch distributed training step (masked NLL)."""

    def loss_fn(params, x, labels, mask):
        logp = model.apply(params, x)
        per_node = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
        return (per_node * mask).sum() / mask.sum()

    @jax.jit
    def step(params, opt_state, x, labels, mask):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, labels, mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step
