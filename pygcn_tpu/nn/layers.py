"""Core layers: graph convolution, dense stacks, pooling, attention scoring.

Functional counterparts of the reference's layer zoo (see file:line cites on
each class); all are pure functions of (params, inputs) and compose under
``jit``/``vmap``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from pygcn_tpu.graph.graph import Graph
from pygcn_tpu.nn import init as tinit
from pygcn_tpu.nn.module import Module, Params, split_keys
from pygcn_tpu.ops.spmm import spmm


def batch_standardize(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Per-feature standardization over axis 0 with biased variance.

    Replicates the reference's quirk of constructing a *fresh*
    ``nn.BatchNorm1d`` on every forward call (reference ``pygcn/models.py:41-45``):
    affine params are freshly initialised (γ=1, β=0) and never trained, and no
    running stats survive — mathematically the layer is exactly train-mode
    standardization over the batch/node axis. Normalizes over ``axis=-2``
    (the node axis) so it applies unchanged to batched ``[B, N, H]`` inputs.
    """
    mean = x.mean(axis=-2, keepdims=True)
    var = x.var(axis=-2, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


@dataclasses.dataclass(frozen=True)
class GraphConv(Module):
    """One GCN layer: ``out = A @ (x @ W) + b``.

    Mirrors reference ``pygcn/layers.py:7-38`` (``GraphConvolution``): dense
    ``mm`` then SpMM, kaiming-uniform weight, uniform ±1/√out bias. The SpMM
    implementation (dense / BCSR Pallas / segment) is chosen per-graph.
    """

    in_features: int
    out_features: int
    bias: bool = True
    impl: str = "auto"

    def init(self, key) -> Params:
        kw, kb = jax.random.split(key)
        p = {"w": tinit.graphconv_weight(kw, self.in_features, self.out_features)}
        if self.bias:
            p["b"] = tinit.graphconv_bias(kb, self.out_features)
        return p

    def apply(self, params: Params, x: jax.Array, graph: Graph) -> jax.Array:
        support = jnp.dot(x, params["w"])
        out = spmm(graph, support, impl=self.impl)
        if self.bias:
            out = out + params["b"]
        return out


@dataclasses.dataclass(frozen=True)
class Dense(Module):
    """Affine layer with torch-Linear-default init."""

    in_features: int
    out_features: int
    bias: bool = True

    def init(self, key) -> Params:
        kw, kb = jax.random.split(key)
        p = {"w": tinit.linear_weight(kw, self.in_features, self.out_features)}
        if self.bias:
            p["b"] = tinit.linear_bias(kb, self.in_features, self.out_features)
        return p

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        out = jnp.dot(x, params["w"])
        if self.bias:
            out = out + params["b"]
        return out


@dataclasses.dataclass(frozen=True)
class MLP3(Module):
    """3-layer MLP, ReLU on the first two, linear head.

    Mirrors reference ``LinearLayers``/``MLPLayers`` (``pygcn/models.py:180-217``).
    """

    nin: int
    nhid1: int
    nhid2: int
    nout: int = 1
    bias: bool = True

    def _children(self):
        return {
            "linear1": Dense(self.nin, self.nhid1, self.bias),
            "linear2": Dense(self.nhid1, self.nhid2, self.bias),
            "linear3": Dense(self.nhid2, self.nout, self.bias),
        }

    def init(self, key) -> Params:
        ch = self._children()
        keys = split_keys(key, list(ch))
        return {name: m.init(keys[name]) for name, m in ch.items()}

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        ch = self._children()
        x = jax.nn.relu(ch["linear1"](params["linear1"], x))
        x = jax.nn.relu(ch["linear2"](params["linear2"], x))
        return ch["linear3"](params["linear3"], x)


@dataclasses.dataclass(frozen=True)
class GeneratorMLP3(MLP3):
    """MLP3 with batch-standardization after ReLU on layers 1-2.

    Mirrors reference ``GeneratorMLPLayers`` (``pygcn/models.py:220-241``).
    """

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        ch = self._children()
        x = batch_standardize(jax.nn.relu(ch["linear1"](params["linear1"], x)))
        x = batch_standardize(jax.nn.relu(ch["linear2"](params["linear2"], x)))
        return ch["linear3"](params["linear3"], x)


@dataclasses.dataclass(frozen=True)
class SoftmaxMLP3(GeneratorMLP3):
    """GeneratorMLP3 with a final softmax over the node axis.

    Mirrors reference ``SoftGeneratorMLP`` (``pygcn/models.py:244-264``).
    """

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        ch = self._children()
        x = batch_standardize(jax.nn.relu(ch["linear1"](params["linear1"], x)))
        x = batch_standardize(jax.nn.relu(ch["linear2"](params["linear2"], x)))
        return jax.nn.softmax(ch["linear3"](params["linear3"], x), axis=0)


def masked_mean_pool(x: jax.Array) -> jax.Array:
    """Masked mean-pool over nodes: last feature dim is a {0,1} selection flag.

    ``x``: [N, F] (one sample) → [F-1]. Features are zeroed where the flag is
    0, summed over nodes, and divided by the flag count. Mirrors reference
    ``PoolLayer`` (``pygcn/models.py:267-286``) — which divides every sample by
    *sample 0's* count; all samples share the same count by construction, so
    the per-sample divisor used here is identical in value and vmap-friendly.
    """
    flag = x[:, -1]
    masked = x * flag[:, None]
    count = jnp.maximum(jnp.count_nonzero(flag), 1)
    return masked[:, :-1].sum(axis=0) / count


@dataclasses.dataclass(frozen=True)
class PoolKeyMLP(Module):
    """Mean over nodes → 3-layer MLP → key vector of dim ``nin``.

    Mirrors reference ``SoftGeneratorPoolMLP`` (``pygcn/models.py:289-312``).
    """

    nin: int
    nhid1: int
    nhid2: int
    bias: bool = True

    def _children(self):
        return {
            "linear1": Dense(self.nin, self.nhid1, self.bias),
            "linear2": Dense(self.nhid1, self.nhid2, self.bias),
            "linear3": Dense(self.nhid2, self.nin, self.bias),
        }

    def init(self, key) -> Params:
        ch = self._children()
        keys = split_keys(key, list(ch))
        return {name: m.init(keys[name]) for name, m in ch.items()}

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        ch = self._children()
        x = x.mean(axis=0, keepdims=True)
        x = jax.nn.relu(ch["linear1"](params["linear1"], x))
        x = jax.nn.relu(ch["linear2"](params["linear2"], x))
        return ch["linear3"](params["linear3"], x)


def attention_scores(key_vec: jax.Array, x: jax.Array) -> jax.Array:
    """Dot-product scoring: ``softmax_n(sum_f key*x[n])`` over nodes.

    Mirrors reference ``SoftGeneratorAttention`` (``pygcn/models.py:316-329``).
    """
    attn = (key_vec * x).sum(axis=1)
    return jax.nn.softmax(attn)
