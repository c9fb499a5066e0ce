"""Graph attention (GAT) ops: edge softmax + dynamic-weight aggregation.

Beyond the reference's model zoo (its only attention is the pooled-key node
scorer, ``pygcn/models.py:316-329``); this exercises the sparse engine with
**edge weights that change every step** — attention logits are recomputed
from activations, so no precomputed layout values apply. TPU-first shape:

- GATv1 logits decompose per edge (u → v) as
  ``leaky_relu(a_src · s_u + a_dst · s_v)`` where ``s = x @ W`` — two scalar
  gathers per edge instead of materializing the concatenated pair;
- the per-receiver softmax is a segment max / exp / segment sum over the
  Graph container's receiver-sorted COO arrays (static shapes, no scatter
  beyond XLA's segment combiner);
- aggregation is the COO segment SpMM with the attention values riding in
  place of stored edge weights.

Everything supports a trailing head axis ``[E_pad, H]`` (multi-head GAT
folds heads into the feature dim, one pass for all heads).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pygcn_tpu.graph.graph import Graph


def _edge_valid(graph: Graph) -> jax.Array:
    """[E_pad] {0,1}: padding edges (beyond n_edges) must not attend."""
    return (jnp.arange(graph.e_pad) < graph.n_edges).astype(jnp.float32)


def edge_softmax(graph: Graph, logits: jax.Array) -> jax.Array:
    """Softmax of edge logits over each receiver's incoming edges.

    ``logits``: [E_pad] or [E_pad, H] → same shape; padded edges get 0.
    Numerically stable (per-receiver max subtraction); isolated receivers
    produce no terms and simply keep zero rows downstream.
    """
    valid = _edge_valid(graph)
    vshape = valid.reshape((-1,) + (1,) * (logits.ndim - 1))
    neg = jnp.where(vshape > 0, logits, -jnp.inf)
    m = jax.ops.segment_max(neg, graph.receivers, num_segments=graph.n_nodes)
    m = jnp.where(jnp.isfinite(m), m, 0.0)  # receivers with no edges
    ex = jnp.exp(neg - jnp.take(m, graph.receivers, axis=0)) * vshape
    denom = jax.ops.segment_sum(ex, graph.receivers, num_segments=graph.n_nodes)
    denom = jnp.take(denom, graph.receivers, axis=0)
    return ex / jnp.maximum(denom, 1e-16)


def attention_aggregate(graph: Graph, s: jax.Array, alpha: jax.Array) -> jax.Array:
    """``out_v = Σ_{u→v} alpha_uv * s_u`` — COO SpMM with dynamic values.

    ``s``: [N, ...feat]; ``alpha``: [E_pad] or [E_pad, H] broadcastable
    against the gathered ``s[senders]``.
    """
    gathered = jnp.take(s, graph.senders, axis=0)
    if alpha.ndim < gathered.ndim:
        alpha = alpha.reshape(alpha.shape + (1,) * (gathered.ndim - alpha.ndim))
    return jax.ops.segment_sum(
        gathered * alpha, graph.receivers, num_segments=graph.n_nodes
    )


def gat_attention(
    graph: Graph,
    s: jax.Array,  # [N, H, F'] per-head transformed features
    a_src: jax.Array,  # [H, F']
    a_dst: jax.Array,  # [H, F']
    negative_slope: float = 0.2,
) -> jax.Array:
    """Per-edge, per-head attention weights ``alpha`` [E_pad, H]."""
    logit_src = jnp.einsum("nhf,hf->nh", s, a_src)
    logit_dst = jnp.einsum("nhf,hf->nh", s, a_dst)
    e = jnp.take(logit_src, graph.senders, axis=0) + jnp.take(
        logit_dst, graph.receivers, axis=0
    )
    return edge_softmax(graph, jax.nn.leaky_relu(e, negative_slope))
