"""GraphSAGE and SGC layers — lightweight model-family extensions.

Not in the reference (its zoo is GCN variants, ``pygcn/models.py``); added
for framework completeness alongside GAT. Both reuse the sparse engine
(``ops/spmm.py``) as-is:

- **SAGE-mean** (Hamilton et al. 2017): ``out = x @ W_self + (D^-1 A x) @ W_nb``
  — separate self/neighbor transforms over a row-normalized aggregation.
  The minibatch (fixed-fanout) form of the same estimator already lives in
  ``ops/sampling.py``; this is the full-batch layer.
- **SGC** (Wu et al. 2019): ``out = (A_hat^K x) @ W`` — the propagation is
  input preprocessing (K SpMMs, computable once and cached), collapsing
  training to logistic regression; the strongest cheap baseline on
  homophilous graphs and a natural fit for TPU (all FLOPs in one GEMM).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from pygcn_tpu.graph.graph import Graph
from pygcn_tpu.nn import init as tinit
from pygcn_tpu.nn.module import Module, Params, split_keys
from pygcn_tpu.ops.spmm import spmm


@dataclasses.dataclass(frozen=True)
class SAGEConv(Module):
    """SAGE-mean layer: ``x @ W_self + agg(x) @ W_nb + b``.

    ``agg`` is whatever propagation the graph carries — pass a
    row-normalized adjacency (``D^-1 A``) for the paper's mean aggregator.
    """

    in_features: int
    out_features: int

    def init(self, key) -> Params:
        ks, kn, kb = jax.random.split(key, 3)
        return {
            "w_self": tinit.graphconv_weight(ks, self.in_features, self.out_features),
            "w_nb": tinit.graphconv_weight(kn, self.in_features, self.out_features),
            "b": tinit.graphconv_bias(kb, self.out_features),
        }

    def apply(self, params, x: jax.Array, graph: Graph) -> jax.Array:
        return (
            jnp.dot(x, params["w_self"])
            + jnp.dot(spmm(graph, x), params["w_nb"])
            + params["b"]
        )


@dataclasses.dataclass(frozen=True)
class SAGE(Module):
    """2-layer SAGE-mean node classifier: ``relu(sage1) → sage2 → log_softmax``."""

    nfeat: int
    nhid: int
    nclass: int

    def _children(self):
        return {
            "sage1": SAGEConv(self.nfeat, self.nhid),
            "sage2": SAGEConv(self.nhid, self.nclass),
        }

    def init(self, key) -> Params:
        ch = self._children()
        keys = split_keys(key, list(ch))
        return {name: m.init(keys[name]) for name, m in ch.items()}

    def apply(self, params, x: jax.Array, graph: Graph) -> jax.Array:
        ch = self._children()
        x = jax.nn.relu(ch["sage1"](params["sage1"], x, graph))
        x = ch["sage2"](params["sage2"], x, graph)
        return jax.nn.log_softmax(x, axis=1)


def sgc_propagate(graph: Graph, x: jax.Array, k: int = 2) -> jax.Array:
    """``A_hat^K x`` — SGC's whole graph computation, run once and cached."""
    for _ in range(k):
        x = spmm(graph, x)
    return x


@dataclasses.dataclass(frozen=True)
class SGC(Module):
    """SGC head: a single linear layer over pre-propagated features.

    ``apply`` takes ``sgc_propagate(graph, x, k)`` output — training never
    touches the graph again.
    """

    nfeat: int
    nclass: int

    def init(self, key) -> Params:
        kw, kb = jax.random.split(key)
        return {
            "w": tinit.graphconv_weight(kw, self.nfeat, self.nclass),
            "b": tinit.graphconv_bias(kb, self.nclass),
        }

    def apply(self, params, x_propagated: jax.Array) -> jax.Array:
        return jax.nn.log_softmax(
            jnp.dot(x_propagated, params["w"]) + params["b"], axis=1
        )
