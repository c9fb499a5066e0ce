"""Distributed SAGE and APPNP over the edge-partitioned mesh.

Extends the halo-exchange machinery (``dist_spmm``) to two more model
families, with parameter pytrees identical to their single-device modules
(``nn/sage.py: SAGE``, ``nn/gin.py: APPNP``) so checkpoints interchange:

- **DistSAGE**: the self-transform ``x @ W_self`` is purely shard-local
  (row-sharded x, replicated weights — zero communication); only the
  neighbor aggregation rides the halo all_to_all.
- **DistAPPNP**: the MLP predictor is shard-local GEMMs; the K
  personalized-PageRank steps are a ``lax.scan`` whose body is ONE
  distributed SpMM + a local axpy — per training step, K halo exchanges
  and nothing else. Propagation depth costs communication, not parameters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pygcn_tpu.nn.gin import _mlp2_apply, _mlp2_init
from pygcn_tpu.nn import init as tinit
from pygcn_tpu.parallel.dist_spmm import make_dist_spmm, pad_node_features
from pygcn_tpu.parallel.partition import DistPlan


class _DistBase:
    def __init__(self, mesh: Mesh, plan: DistPlan, axis: str = "graph"):
        self.mesh = mesh
        self.plan = plan
        self.axis = axis
        self.spmm = make_dist_spmm(mesh, plan, axis)

    def shard_params(self, params):
        return jax.device_put(params, NamedSharding(self.mesh, P()))

    def shard_x(self, x):
        x = pad_node_features(jnp.asarray(x), self.plan)
        return jax.device_put(x, NamedSharding(self.mesh, P(self.axis, None)))


class DistSAGE(_DistBase):
    """2-layer SAGE-mean classifier; params match ``nn.sage.SAGE``."""

    def __init__(self, mesh, plan, nfeat: int, nhid: int, nclass: int,
                 axis: str = "graph"):
        super().__init__(mesh, plan, axis)
        self.dims = [(nfeat, nhid), (nhid, nclass)]

    def init(self, key):
        out = {}
        for name, (fi, fo) in zip(("sage1", "sage2"), self.dims):
            key, ks, kn, kb = jax.random.split(key, 4)
            out[name] = {
                "w_self": tinit.graphconv_weight(ks, fi, fo),
                "w_nb": tinit.graphconv_weight(kn, fi, fo),
                "b": tinit.graphconv_bias(kb, fo),
            }
        return out

    def _layer(self, p, h):
        return (
            jnp.dot(h, p["w_self"]) + jnp.dot(self.spmm(h), p["w_nb"]) + p["b"]
        )

    def apply(self, params, x):
        h = jax.nn.relu(self._layer(params["sage1"], x))
        h = self._layer(params["sage2"], h)
        return jax.nn.log_softmax(h, axis=1)


class DistAPPNP(_DistBase):
    """Predict-then-propagate classifier; params match ``nn.gin.APPNP``."""

    def __init__(self, mesh, plan, nfeat: int, nhid: int, nclass: int,
                 k: int = 10, alpha: float = 0.1, axis: str = "graph"):
        super().__init__(mesh, plan, axis)
        self.nfeat, self.nhid, self.nclass = nfeat, nhid, nclass
        self.k, self.alpha = k, alpha

    def init(self, key):
        return {"mlp": _mlp2_init(key, self.nfeat, self.nhid, self.nclass)}

    def apply(self, params, x):
        h = _mlp2_apply(params["mlp"], x)

        def step(z, _):
            return (1.0 - self.alpha) * self.spmm(z) + self.alpha * h, None

        z, _ = jax.lax.scan(step, h, None, length=self.k)
        return jax.nn.log_softmax(z, axis=1)
