"""Graph attention network (GAT) layers — a model-family extension.

Not in the reference (its zoo is GCN variants, ``pygcn/models.py``; the only
attention is the pooled-key node scorer at ``models.py:316-329``); included
because a production GNN framework needs the attention family, and it proves
the sparse engine on **dynamic** edge weights (recomputed each step, unlike
GCN's precomputed ``A_hat``). Veličković et al. 2018 semantics: multi-head
additive attention, ELU activations, head-concat on hidden layers and
head-mean on the output layer.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from pygcn_tpu.graph.graph import Graph
from pygcn_tpu.nn import init as tinit
from pygcn_tpu.nn.module import Module, Params, split_keys
from pygcn_tpu.ops.gat import attention_aggregate, gat_attention


@dataclasses.dataclass(frozen=True)
class GATConv(Module):
    """One multi-head GAT layer.

    ``out = concat_h(Σ_u alpha^h_uv · (x_u @ W^h))`` (mean over heads when
    ``concat=False``); ``alpha`` is the per-receiver softmax of
    ``leaky_relu(a_src·s_u + a_dst·s_v)``. All heads run in one pass (heads
    folded into the feature dim — one gather serves every head).
    """

    in_features: int
    out_features: int  # per head
    heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2
    bias: bool = True

    def init(self, key) -> Params:
        kw, ks, kd, kb = jax.random.split(key, 4)
        h, f = self.heads, self.out_features
        p = {
            "w": tinit.graphconv_weight(kw, self.in_features, h * f),
            "a_src": tinit.graphconv_weight(ks, h, f),
            "a_dst": tinit.graphconv_weight(kd, h, f),
        }
        if self.bias:
            out_dim = h * f if self.concat else f
            p["b"] = tinit.graphconv_bias(kb, out_dim)
        return p

    def apply(self, params, x: jax.Array, graph: Graph,
              attn_dropout=None, edge_map=None, hybrid_tiles=False,
              tiles_t=None, colpanel=False) -> jax.Array:
        n = x.shape[0]
        h, f = self.heads, self.out_features
        s = jnp.dot(x, params["w"]).reshape(n, h, f)
        if colpanel:
            # multi-million-row path: panel-sliced small-table gathers
            # (ops/gat_colpanel; run check_gat_colpanel(graph) once host-side)
            from pygcn_tpu.ops.gat_colpanel import gat_conv_colpanel

            out = gat_conv_colpanel(
                graph, s, params["a_src"], params["a_dst"],
                self.negative_slope, attn_dropout=attn_dropout,
            )
        elif hybrid_tiles and attn_dropout is None:
            # Pallas tile attention + ELL residual (ops/gat.gat_conv_hybrid);
            # attention dropout is unsupported there — fall through to the
            # slot path when training with it.
            from pygcn_tpu.ops.gat import gat_conv_hybrid

            out = gat_conv_hybrid(
                graph, tiles_t, s, params["a_src"], params["a_dst"],
                self.negative_slope,
            )
        elif edge_map is not None:
            from pygcn_tpu.ops.gat import gat_conv_ell

            out = gat_conv_ell(
                graph, edge_map, s, params["a_src"], params["a_dst"],
                self.negative_slope, attn_dropout=attn_dropout,
            )
        else:
            alpha = gat_attention(
                graph, s, params["a_src"], params["a_dst"], self.negative_slope
            )  # [E_pad, H]
            if attn_dropout is not None:
                drop, slot = attn_dropout
                alpha = drop(slot, alpha)  # paper: dropout on the coefficients
            out = attention_aggregate(graph, s, alpha)  # [N, H, F]
        out = out.reshape(n, h * f) if self.concat else out.mean(axis=1)
        if "b" in params:
            out = out + params["b"]
        return out


@dataclasses.dataclass(frozen=True)
class GATv2Conv(Module):
    """One multi-head GATv2 layer (Brody et al. 2022, "How Attentive are
    Graph Attention Networks?").

    ``e_uv = a · leaky_relu(x_u @ W_l + x_v @ W_r)`` — the nonlinearity
    precedes the attention vector, so the neighbor ranking can vary per
    receiver (dynamic attention; v1's is provably static). Aggregates the
    source transform: ``out_v = Σ_u alpha_uv · (x_u @ W_l)``.
    ``share_weights=True`` ties ``W_r = W_l`` (the paper's ablation).
    """

    in_features: int
    out_features: int  # per head
    heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2
    bias: bool = True
    share_weights: bool = False

    def init(self, key) -> Params:
        kl, kr, ka, kb = jax.random.split(key, 4)
        h, f = self.heads, self.out_features
        p = {
            "w_l": tinit.graphconv_weight(kl, self.in_features, h * f),
            "a": tinit.graphconv_weight(ka, h, f),
        }
        if not self.share_weights:
            p["w_r"] = tinit.graphconv_weight(kr, self.in_features, h * f)
        if self.bias:
            out_dim = h * f if self.concat else f
            p["b"] = tinit.graphconv_bias(kb, out_dim)
        return p

    def apply(self, params, x: jax.Array, graph: Graph,
              attn_dropout=None, edge_map=None, hybrid_tiles=False,
              tiles_t=None, colpanel=False) -> jax.Array:
        n = x.shape[0]
        h, f = self.heads, self.out_features
        s_l = jnp.dot(x, params["w_l"]).reshape(n, h, f)
        w_r = params["w_l"] if self.share_weights else params["w_r"]
        s_r = jnp.dot(x, w_r).reshape(n, h, f)
        if colpanel:
            from pygcn_tpu.ops.gat_colpanel import gatv2_conv_colpanel

            out = gatv2_conv_colpanel(
                graph, s_l, s_r, params["a"], self.negative_slope,
                attn_dropout=attn_dropout,
            )
        elif hybrid_tiles and attn_dropout is None:
            from pygcn_tpu.ops.gat import gatv2_conv_hybrid

            out = gatv2_conv_hybrid(
                graph, tiles_t, s_l, s_r, params["a"], self.negative_slope,
            )
        elif edge_map is not None:
            from pygcn_tpu.ops.gat import gatv2_conv_ell

            out = gatv2_conv_ell(
                graph, edge_map, s_l, s_r, params["a"],
                self.negative_slope, attn_dropout=attn_dropout,
            )
        else:
            from pygcn_tpu.ops.gat import gatv2_attention

            alpha = gatv2_attention(
                graph, s_l, s_r, params["a"], self.negative_slope
            )  # [E_pad, H]
            if attn_dropout is not None:
                drop, slot = attn_dropout
                alpha = drop(slot, alpha)
            out = attention_aggregate(graph, s_l, alpha)  # [N, H, F]
        out = out.reshape(n, h * f) if self.concat else out.mean(axis=1)
        if "b" in params:
            out = out + params["b"]
        return out


@dataclasses.dataclass(frozen=True)
class GAT(Module):
    """2-layer GAT: ``elu(GATConv(heads, concat)) → GATConv(1 head, mean)``.

    The standard transductive-benchmark configuration (8 hidden heads of 8
    features, 1 output head averaging) with log-softmax output for NLL
    training.
    """

    nfeat: int
    nhid: int  # per head
    nclass: int
    heads: int = 8
    out_heads: int = 1
    negative_slope: float = 0.2
    dropout: float = 0.0  # applied to inputs AND attention when rng given
    v2: bool = False  # GATv2 convs (dynamic attention) instead of v1

    def _children(self):
        conv = GATv2Conv if self.v2 else GATConv
        return {
            "gat1": conv(self.nfeat, self.nhid, heads=self.heads,
                         concat=True, negative_slope=self.negative_slope),
            "gat2": conv(self.nhid * self.heads, self.nclass,
                         heads=self.out_heads, concat=False,
                         negative_slope=self.negative_slope),
        }

    def init(self, key) -> Params:
        ch = self._children()
        keys = split_keys(key, list(ch))
        return {name: m.init(keys[name]) for name, m in ch.items()}

    def apply(self, params, x: jax.Array, graph: Graph,
              dropout_rng=None, edge_map=None, hybrid_tiles=False,
              tiles_t=None, colpanel=False) -> jax.Array:
        """Pass ``dropout_rng`` during training to enable the paper's
        dropout on layer inputs and attention coefficients (eval: omit).
        Pass ``edge_map`` (``ops.gat.build_edge_map``, needs the graph's ELL
        layout) to run softmax/aggregation on virtual rows — the fast path
        for power-law graphs. ``hybrid_tiles=True`` (graph built with a
        hybrid ELL-residual layout, ``tiles_t`` from
        ``ops.gat.build_gat_tiles_t``) runs tile edges through the fused
        Pallas VMEM attention kernel (v1 and v2 variants); attention
        dropout falls back to the slot path (input dropout still
        applies). ``colpanel=True`` (graph built with the colpanel layout —
        the >1M-row auto-policy) runs attention on panel-sliced small-table
        gathers (``ops/gat_colpanel``); call
        ``ops.gat_colpanel.check_gat_colpanel(graph)`` once host-side."""
        ch = self._children()
        drop = None
        if dropout_rng is not None and self.dropout > 0.0:
            keys = jax.random.split(dropout_rng, 4)
            keep = 1.0 - self.dropout

            def drop_fn(i, a):
                # i: key slot, or (slot, bucket) from the per-bucket fused path
                k = (jax.random.fold_in(keys[i[0]], i[1])
                     if isinstance(i, tuple) else keys[i])
                m = jax.random.bernoulli(k, keep, a.shape)
                return jnp.where(m, a / keep, 0.0)

            drop = drop_fn
        hk = {}
        if hybrid_tiles:
            hk = {"hybrid_tiles": True, "tiles_t": tiles_t}
        elif colpanel:
            hk = {"colpanel": True}
        if drop is not None:
            x = drop(0, x)
        x = ch["gat1"].apply(params["gat1"], x, graph,
                             attn_dropout=(drop, 1) if drop else None,
                             edge_map=edge_map, **hk)
        x = jax.nn.elu(x)
        if drop is not None:
            x = drop(2, x)
        x = ch["gat2"].apply(params["gat2"], x, graph,
                             attn_dropout=(drop, 3) if drop else None,
                             edge_map=edge_map, **hk)
        return jax.nn.log_softmax(x, axis=1)
