"""GIN and APPNP layers — model-family extensions over the sparse engine.

Not in the reference (its zoo is GCN variants, ``pygcn/models.py``); added
for framework completeness alongside GAT/SAGE/SGC. Both reuse
``ops/spmm.py`` unchanged:

- **GIN** (Xu et al. 2019, "How Powerful are GNNs"): ``h = MLP((1+eps)·x +
  Σ_neighbors x)`` — sum aggregation (pass an *unnormalized* adjacency; a
  normalized one silently weakens GIN to mean-style aggregation) with a
  learnable ``eps`` and a 2-layer MLP per conv. The maximally-expressive
  aggregator under the WL test.
- **APPNP** (Gasteiger et al. 2019, "Predict then Propagate"): an MLP
  predicts per-node logits ``h``, then K steps of personalized-PageRank
  propagation ``z ← (1−α)·A_hat z + α·h``. The propagation is a
  ``lax.scan`` over SpMMs — static trip count, no per-step Python, and the
  predictor/propagation split keeps all trainable FLOPs in dense GEMMs
  (MXU) while the graph appears only inside the scan.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from pygcn_tpu.graph.graph import Graph
from pygcn_tpu.nn import init as tinit
from pygcn_tpu.nn.module import Module, Params, split_keys
from pygcn_tpu.ops.spmm import spmm


def _mlp2_init(key, nin: int, nhid: int, nout: int) -> Params:
    k1, k2, kb1, kb2 = jax.random.split(key, 4)
    return {
        "w1": tinit.graphconv_weight(k1, nin, nhid),
        "b1": tinit.graphconv_bias(kb1, nhid),
        "w2": tinit.graphconv_weight(k2, nhid, nout),
        "b2": tinit.graphconv_bias(kb2, nout),
    }


def _mlp2_apply(params, x: jax.Array) -> jax.Array:
    h = jax.nn.relu(jnp.dot(x, params["w1"]) + params["b1"])
    return jnp.dot(h, params["w2"]) + params["b2"]


@dataclasses.dataclass(frozen=True)
class GINConv(Module):
    """GIN layer: ``MLP((1 + eps) * x + spmm(A, x))``.

    ``eps`` is a learnable scalar initialized to 0 (the paper's GIN-eps).
    The aggregation is whatever the graph carries — use raw 0/1 edge
    weights for the paper's sum aggregator.
    """

    in_features: int
    out_features: int
    hidden_features: int = 0  # 0 → out_features

    def init(self, key) -> Params:
        nhid = self.hidden_features or self.out_features
        return {
            "mlp": _mlp2_init(key, self.in_features, nhid, self.out_features),
            "eps": jnp.zeros(()),
        }

    def apply(self, params, x: jax.Array, graph: Graph) -> jax.Array:
        agg = spmm(graph, x) + (1.0 + params["eps"]) * x
        return _mlp2_apply(params["mlp"], agg)


@dataclasses.dataclass(frozen=True)
class GIN(Module):
    """2-layer GIN node classifier: ``relu(gin1) → gin2 → log_softmax``."""

    nfeat: int
    nhid: int
    nclass: int

    def _children(self):
        return {
            "gin1": GINConv(self.nfeat, self.nhid),
            "gin2": GINConv(self.nhid, self.nclass, hidden_features=self.nhid),
        }

    def init(self, key) -> Params:
        ch = self._children()
        keys = split_keys(key, list(ch))
        return {name: m.init(keys[name]) for name, m in ch.items()}

    def apply(self, params, x: jax.Array, graph: Graph) -> jax.Array:
        ch = self._children()
        x = jax.nn.relu(ch["gin1"](params["gin1"], x, graph))
        x = ch["gin2"](params["gin2"], x, graph)
        return jax.nn.log_softmax(x, axis=1)


def appnp_propagate(graph: Graph, h: jax.Array, k: int, alpha: float) -> jax.Array:
    """K personalized-PageRank steps ``z ← (1−α)·A_hat z + α·h``.

    A ``lax.scan`` with a static trip count: one compiled SpMM+axpy body,
    no Python loop unrolling in the jaxpr for large K.
    """

    def step(z, _):
        return (1.0 - alpha) * spmm(graph, z) + alpha * h, None

    z, _ = jax.lax.scan(step, h, None, length=k)
    return z


@dataclasses.dataclass(frozen=True)
class APPNP(Module):
    """Predict-then-propagate node classifier.

    A 2-layer MLP produces per-node logits (graph-free, pure GEMM), then
    :func:`appnp_propagate` smooths them over ``A_hat`` — decoupling
    feature transformation depth from propagation depth.
    """

    nfeat: int
    nhid: int
    nclass: int
    k: int = 10
    alpha: float = 0.1

    def init(self, key) -> Params:
        return {"mlp": _mlp2_init(key, self.nfeat, self.nhid, self.nclass)}

    def apply(self, params, x: jax.Array, graph: Graph) -> jax.Array:
        h = _mlp2_apply(params["mlp"], x)
        z = appnp_propagate(graph, h, self.k, self.alpha)
        return jax.nn.log_softmax(z, axis=1)
