"""Model zoo mirroring the reference's families, built TPU-first.

Each model is a frozen dataclass Module; batching over policy samples is a
``vmap`` (replacing the reference's per-sample Python loop at
``pygcn/models.py:343-349``). Citations point at the reference classes whose
behaviour each model reproduces.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from pygcn_tpu.graph.graph import Graph
from pygcn_tpu.nn.layers import (
    Dense,
    GeneratorMLP3,
    GraphConv,
    MLP3,
    PoolKeyMLP,
    attention_scores,
    batch_standardize,
    masked_mean_pool,
)
from pygcn_tpu.nn.module import Module, Params, split_keys


@dataclasses.dataclass(frozen=True)
class GCN3(Module):
    """3-layer GCN backbone with post-ReLU batch standardization.

    Mirrors reference ``GCN`` (``pygcn/models.py:17-71``):
    ``bs(relu(gc1)) → bs(relu(gc2)) → relu(gc3)``; raw ReLU output (the
    reference removed log_softmax). Dropout is defined but disabled in the
    reference; pass ``dropout_rng`` to enable it here.
    """

    nfeat: int
    nhid: int
    nclass: int
    dropout: float = 0.0
    impl: str = "auto"

    def _children(self):
        return {
            "gc1": GraphConv(self.nfeat, self.nhid, impl=self.impl),
            "gc2": GraphConv(self.nhid, self.nhid, impl=self.impl),
            "gc3": GraphConv(self.nhid, self.nclass, impl=self.impl),
        }

    def init(self, key) -> Params:
        ch = self._children()
        keys = split_keys(key, list(ch))
        return {name: m.init(keys[name]) for name, m in ch.items()}

    def apply(self, params, x, graph: Graph, dropout_rng=None) -> jax.Array:
        ch = self._children()
        x = batch_standardize(jax.nn.relu(ch["gc1"](params["gc1"], x, graph)))
        x = _maybe_dropout(x, self.dropout, dropout_rng, 0)
        x = batch_standardize(jax.nn.relu(ch["gc2"](params["gc2"], x, graph)))
        x = _maybe_dropout(x, self.dropout, dropout_rng, 1)
        return jax.nn.relu(ch["gc3"](params["gc3"], x, graph))


@dataclasses.dataclass(frozen=True)
class GeneratorGCN3(GCN3):
    """3-layer GCN, plain ReLU (no standardization).

    Mirrors reference ``GeneratorGCN`` / ``SoftGeneratorGCN``
    (``pygcn/models.py:74-177`` — the two are copy-paste identical).
    """

    def apply(self, params, x, graph: Graph, dropout_rng=None) -> jax.Array:
        ch = self._children()
        x = jax.nn.relu(ch["gc1"](params["gc1"], x, graph))
        x = jax.nn.relu(ch["gc2"](params["gc2"], x, graph))
        return jax.nn.relu(ch["gc3"](params["gc3"], x, graph))


@dataclasses.dataclass(frozen=True)
class KipfGCN(Module):
    """Classic 2-layer Kipf GCN for semi-supervised node classification.

    The upstream architecture the reference forked from (and the disabled Cora
    path at reference ``pygcn/utils.py:343-383`` targets): ``dropout → gc1 →
    relu → dropout → gc2 → log_softmax``. This is the BASELINE Cora config
    (hidden 16, dropout 0.5).
    """

    nfeat: int
    nhid: int
    nclass: int
    dropout: float = 0.5
    impl: str = "auto"

    def _children(self):
        return {
            "gc1": GraphConv(self.nfeat, self.nhid, impl=self.impl),
            "gc2": GraphConv(self.nhid, self.nclass, impl=self.impl),
        }

    def init(self, key) -> Params:
        ch = self._children()
        keys = split_keys(key, list(ch))
        return {name: m.init(keys[name]) for name, m in ch.items()}

    def apply(self, params, x, graph: Graph, dropout_rng=None) -> jax.Array:
        ch = self._children()
        x = _maybe_dropout(x, self.dropout, dropout_rng, 0)
        x = jax.nn.relu(ch["gc1"](params["gc1"], x, graph))
        x = _maybe_dropout(x, self.dropout, dropout_rng, 1)
        x = ch["gc2"](params["gc2"], x, graph)
        return jax.nn.log_softmax(x, axis=1)


@dataclasses.dataclass(frozen=True)
class GCNOverMLP(Module):
    """Surrogate evaluator: GCN on the first ``dim_touched`` feature dims,
    re-concat untouched dims (incl. the vac flag), masked mean-pool, MLP head.

    Mirrors reference ``GCN_OVER_MLP`` (``pygcn/models.py:333-355``), with the
    per-sample Python loop replaced by ``vmap`` over the batch axis.
    """

    gcn_nfeat: int
    gcn_nhid: int
    gcn_nclass: int
    dim_touched: int
    linear_nin: int
    linear_nhid1: int
    linear_nhid2: int
    linear_nout: int = 1
    impl: str = "auto"

    def _children(self):
        return {
            "gcn": GCN3(self.gcn_nfeat, self.gcn_nhid, self.gcn_nclass, impl=self.impl),
            "mlp": MLP3(self.linear_nin, self.linear_nhid1, self.linear_nhid2, self.linear_nout),
        }

    def init(self, key) -> Params:
        ch = self._children()
        keys = split_keys(key, list(ch))
        return {name: m.init(keys[name]) for name, m in ch.items()}

    def apply(self, params, x, graph: Graph) -> jax.Array:
        """``x``: [B, N, F] (batch of policy samples) → [B, linear_nout].

        The whole batch runs through the GCN at once: every SpMM folds the
        batch into one wide ``[N, B*H]`` product (see ``ops.spmm``), and
        ``batch_standardize`` normalizes over the node axis per sample — a
        single fused step replacing the reference's per-sample loop
        (``pygcn/models.py:343-349``).
        """
        ch = self._children()
        g = ch["gcn"](params["gcn"], x[:, :, : self.dim_touched], graph)
        h = jnp.concatenate([g, x[:, :, self.dim_touched :]], axis=2)
        pooled = jax.vmap(masked_mean_pool)(h)  # [B, gcn_nclass + untouched - 1]
        return ch["mlp"](params["mlp"], pooled)


def topk_flag_straight_through(scores: jax.Array, nn_select: int) -> jax.Array:
    """Differentiable top-K selection via the reference's reciprocal mask.

    ``scores``: [N, 1] → vac_flag [N, 1] with ≈1 at the NN highest-scoring
    nodes and 0 elsewhere, while ``d(vac_flag)/d(scores) = 1/stop_grad(score)``
    on selected nodes keeps gradients flowing. Mirrors reference ``Generator``
    (``pygcn/models.py:373-377``): entries strictly greater than the
    (NN+1)-th largest score are selected.
    """
    s = scores[:, 0]
    thresh = jax.lax.top_k(s, nn_select + 1)[0][-1]
    inv = 1.0 / jax.lax.stop_gradient(s)
    mask = jnp.where(s > thresh, inv, 0.0)
    return (s * mask)[:, None]


@dataclasses.dataclass(frozen=True)
class TopKGenerator(Module):
    """Differentiable top-K vaccination-policy generator.

    Mirrors reference ``Generator`` (``pygcn/models.py:358-379``):
    GeneratorGCN → concat untouched features → GeneratorMLP score per node →
    reciprocal-mask top-K flag.
    """

    gcn_nfeat: int
    gcn_nhid: int
    gcn_nclass: int
    dim_touched: int
    nn_select: int
    linear_nin: int
    linear_nhid1: int
    linear_nhid2: int
    linear_nout: int = 1
    impl: str = "auto"

    def _children(self):
        return {
            "gcn": GeneratorGCN3(self.gcn_nfeat, self.gcn_nhid, self.gcn_nclass, impl=self.impl),
            "mlp": GeneratorMLP3(self.linear_nin, self.linear_nhid1, self.linear_nhid2, self.linear_nout),
        }

    def init(self, key) -> Params:
        ch = self._children()
        keys = split_keys(key, list(ch))
        return {name: m.init(keys[name]) for name, m in ch.items()}

    def scores(self, params, x, graph: Graph) -> jax.Array:
        ch = self._children()
        g = ch["gcn"](params["gcn"], x[:, : self.dim_touched], graph)
        h = jnp.concatenate([g, x[:, self.dim_touched :]], axis=1)
        return ch["mlp"](params["mlp"], h)

    def apply(self, params, x, graph: Graph) -> jax.Array:
        return topk_flag_straight_through(self.scores(params, x, graph), self.nn_select)


@dataclasses.dataclass(frozen=True)
class HierarchicalGenerator(Module):
    """Top-K generator that excludes a target demographic group.

    Mirrors reference ``Hierarchical_Generator`` (``pygcn/models.py:382-408``):
    the last feature dim is a group id; scores of ``target_group`` are floored
    to the minimum before top-K, so its nodes are never selected. Uses the
    plain (non-standardizing) MLP head, as the reference does.
    """

    gcn_nfeat: int
    gcn_nhid: int
    gcn_nclass: int
    dim_touched: int
    nn_select: int
    linear_nin: int
    linear_nhid1: int
    linear_nhid2: int
    linear_nout: int = 1
    target_group: int = 0
    impl: str = "auto"

    def _children(self):
        return {
            "gcn": GeneratorGCN3(self.gcn_nfeat, self.gcn_nhid, self.gcn_nclass, impl=self.impl),
            "mlp": MLP3(self.linear_nin, self.linear_nhid1, self.linear_nhid2, self.linear_nout),
        }

    def init(self, key) -> Params:
        ch = self._children()
        keys = split_keys(key, list(ch))
        return {name: m.init(keys[name]) for name, m in ch.items()}

    def apply(self, params, x, graph: Graph) -> jax.Array:
        ch = self._children()
        g = ch["gcn"](params["gcn"], x[:, : self.dim_touched], graph)
        h = jnp.concatenate([g, x[:, self.dim_touched : -1]], axis=1)
        scores = ch["mlp"](params["mlp"], h)
        floor = scores.min()
        scores = jnp.where(x[:, -1:] == self.target_group, floor, scores)
        return topk_flag_straight_through(scores, self.nn_select)


@dataclasses.dataclass(frozen=True)
class SoftGenerator(Module):
    """Stochastic policy: GCN → pooled key vector → attention softmax over
    nodes = categorical action distribution.

    Mirrors reference ``SoftGenerator`` (``pygcn/models.py:412-436``). The
    replay buffer / log-prob bookkeeping lives in ``pygcn_tpu.policy``, not in
    the model (models here are pure functions).
    """

    gcn_nfeat: int
    gcn_nhid: int
    gcn_nclass: int
    dim_touched: int
    nn_select: int
    linear_nhid1: int
    linear_nhid2: int
    impl: str = "auto"

    def _children(self):
        return {
            "gcn": GeneratorGCN3(self.gcn_nfeat, self.gcn_nhid, self.gcn_nclass, impl=self.impl),
            # reference hardcodes the key dim to 32 == gcn output dim
            # (pygcn/models.py:417); here it follows gcn_nclass.
            "pool_mlp": PoolKeyMLP(self.gcn_nclass, self.linear_nhid1, self.linear_nhid2),
        }

    def init(self, key) -> Params:
        ch = self._children()
        keys = split_keys(key, list(ch))
        return {name: m.init(keys[name]) for name, m in ch.items()}

    def apply(self, params, x, graph: Graph) -> jax.Array:
        """Returns [N] categorical probabilities over nodes."""
        ch = self._children()
        g = ch["gcn"](params["gcn"], x[:, : self.dim_touched], graph)
        key_vec = ch["pool_mlp"](params["pool_mlp"], g)
        return attention_scores(key_vec, g)


@dataclasses.dataclass(frozen=True)
class GCNRegressor(Module):
    """GCN backbone → mean over nodes → MLP head → scalar.

    The factory's ``'GCN'`` pipeline as *used* by the legacy trainer
    (reference ``pygcn/train.py:147-161``: ``model[0]`` then node-mean then
    ``model[1]``). Note the reference factory itself passes six args to a
    five-arg constructor (``pygcn/models.py:444``) and would crash — this is
    the repaired semantic.
    """

    gcn_nfeat: int
    gcn_nhid: int
    gcn_nclass: int
    linear_nin: int
    linear_nhid1: int
    linear_nhid2: int
    linear_nout: int = 1
    impl: str = "auto"

    def _children(self):
        return {
            "gcn": GCN3(self.gcn_nfeat, self.gcn_nhid, self.gcn_nclass, impl=self.impl),
            "mlp": MLP3(self.linear_nin, self.linear_nhid1, self.linear_nhid2, self.linear_nout),
        }

    def init(self, key) -> Params:
        ch = self._children()
        keys = split_keys(key, list(ch))
        return {name: m.init(keys[name]) for name, m in ch.items()}

    def apply(self, params, x, graph: Graph) -> jax.Array:
        ch = self._children()
        g = ch["gcn"](params["gcn"], x, graph)
        return ch["mlp"](params["mlp"], g.mean(axis=0))


@dataclasses.dataclass(frozen=True)
class PoolMLPModel(Module):
    """Masked mean-pool → MLP head (the no-GCN baseline).

    The factory's ``'MLP'`` pipeline (reference ``pygcn/models.py:447-451``,
    used by ``pygcn/mlp.py``).
    """

    linear_nin: int
    linear_nhid1: int
    linear_nhid2: int
    linear_nout: int = 1

    def _children(self):
        return {"mlp": MLP3(self.linear_nin, self.linear_nhid1, self.linear_nhid2, self.linear_nout)}

    def init(self, key) -> Params:
        ch = self._children()
        keys = split_keys(key, list(ch))
        return {name: m.init(keys[name]) for name, m in ch.items()}

    def apply(self, params, x) -> jax.Array:
        """``x``: [B, N, F] → [B, linear_nout]."""
        ch = self._children()
        pooled = jax.vmap(masked_mean_pool)(x)
        return ch["mlp"](params["mlp"], pooled)


def _maybe_dropout(x, rate, rng, salt):
    if rng is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(jax.random.fold_in(rng, salt), keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def get_model(config, model_name: str = "GCN") -> Module:
    """Name → model dispatch mirroring reference ``get_model``
    (``pygcn/models.py:440-460``), plus ``'KipfGCN'`` for the classic
    2-layer node classifier.
    """
    if model_name == "GCN":
        return GCNRegressor(
            config.gcn_nfeat, config.gcn_nhid, config.gcn_nclass,
            config.linear_nin, config.linear_nhid1, config.linear_nhid2,
            config.linear_nout,
        )
    if model_name == "MLP":
        return PoolMLPModel(
            config.linear_nin, config.linear_nhid1, config.linear_nhid2, config.linear_nout
        )
    if model_name == "GNN_OVER_MLP":
        return GCNOverMLP(
            config.gcn_nfeat, config.gcn_nhid, config.gcn_nclass, config.dim_touched,
            config.linear_nin, config.linear_nhid1, config.linear_nhid2, config.linear_nout,
        )
    if model_name == "Generator":
        return TopKGenerator(
            config.gcn_nfeat, config.gcn_nhid, config.gcn_nclass, config.dim_touched,
            config.NN, config.linear_nin, config.linear_nhid1, config.linear_nhid2,
            config.linear_nout,
        )
    if model_name == "Hierarchical_Generator":
        return HierarchicalGenerator(
            config.gcn_nfeat, config.gcn_nhid, config.gcn_nclass, config.dim_touched,
            config.NN, config.linear_nin, config.linear_nhid1, config.linear_nhid2,
            config.linear_nout,
        )
    if model_name == "SoftGenerator":
        return SoftGenerator(
            config.gcn_nfeat, config.gcn_nhid, config.gcn_nclass, config.dim_touched,
            config.NN, config.linear_nhid1, config.linear_nhid2,
        )
    if model_name == "KipfGCN":
        return KipfGCN(config.gcn_nfeat, config.gcn_nhid, config.gcn_nclass)
    if model_name == "GAT":
        from pygcn_tpu.nn.gat import GAT

        return GAT(config.gcn_nfeat, config.gcn_nhid, config.gcn_nclass)
    if model_name == "GATv2":
        from pygcn_tpu.nn.gat import GAT

        return GAT(config.gcn_nfeat, config.gcn_nhid, config.gcn_nclass,
                   v2=True)
    if model_name == "SAGE":
        from pygcn_tpu.nn.sage import SAGE

        return SAGE(config.gcn_nfeat, config.gcn_nhid, config.gcn_nclass)
    if model_name == "GIN":
        from pygcn_tpu.nn.gin import GIN

        return GIN(config.gcn_nfeat, config.gcn_nhid, config.gcn_nclass)
    if model_name == "APPNP":
        from pygcn_tpu.nn.gin import APPNP

        return APPNP(config.gcn_nfeat, config.gcn_nhid, config.gcn_nclass)
    raise ValueError(f"unknown model {model_name!r}")
