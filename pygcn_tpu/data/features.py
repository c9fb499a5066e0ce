"""Node-feature assembly for the surrogate evaluator and generators.

Mirrors the feature engineering of the reference evaluator trainer:

- graph centralities (degree / closeness / betweenness) + mobility level
  (adjacency row sums), standardized (``pygcn/gnn-over-mlp.py:174-209``) —
  computed with networkx (the reference converts networkx → igraph purely for
  speed; igraph is not available here, and betweenness supports sampling);
- the four assembly modes over (demographics+embeddings) × with/without
  original-feature duplication, producing ``dim_touched``
  (``pygcn/gnn-over-mlp.py:218-237``);
- StandardScaler-style standardization fit on all data
  (``pygcn/utils.py:280-287``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def standardize(x: np.ndarray) -> np.ndarray:
    """Column-wise (x - mean)/std, std 0 → leave centered values (sklearn
    StandardScaler semantics)."""
    x = np.asarray(x, np.float64)
    mean = x.mean(axis=0, keepdims=True)
    std = x.std(axis=0, keepdims=True)
    std = np.where(std == 0, 1.0, std)
    return ((x - mean) / std).astype(np.float32)


def centrality_features(
    adj: np.ndarray,
    normalize: bool = True,
    betweenness_samples: Optional[int] = None,
    max_neighbors: Optional[int] = None,
    seed: int = 0,
) -> np.ndarray:
    """[N, 4]: degree, closeness, betweenness, mobility level.

    Degree/closeness/betweenness follow igraph's conventions as used by the
    reference (raw degree counts, closeness over the weighted graph treated as
    unweighted adjacency, exact betweenness). Co-visitation graphs are dense,
    so exact path centralities are intractable at reference scale (2943 nodes
    ≈ 8.7M edges): for graphs over ~1000 nodes the path centralities default
    to the top-``max_neighbors`` strongest edges per node (structure-
    preserving sparsification) with pivot-sampled betweenness.
    """
    import networkx as nx

    adj = np.asarray(adj)
    n = adj.shape[0]
    deg = np.count_nonzero(adj, axis=1).astype(np.float64)
    mob = adj.sum(axis=1).astype(np.float64)

    if n > 1000 and max_neighbors is None:
        max_neighbors = 20
    if betweenness_samples is None and n > 1000:
        betweenness_samples = 64
    if max_neighbors is not None and max_neighbors < n:
        # keep each node's strongest edges only for the path centralities
        sparse = np.zeros_like(adj)
        top = np.argpartition(-adj, max_neighbors, axis=1)[:, :max_neighbors]
        rows = np.arange(n)[:, None]
        sparse[rows, top] = adj[rows, top]
        path_adj = np.maximum(sparse, sparse.T)
    else:
        path_adj = adj
    g = nx.from_numpy_array(path_adj)

    clo = np.array(list(nx.closeness_centrality(g).values()))
    if betweenness_samples is not None and betweenness_samples < n:
        bet_dict = nx.betweenness_centrality(g, k=betweenness_samples, normalized=False, seed=seed)
    else:
        bet_dict = nx.betweenness_centrality(g, normalized=False)
    bet = np.array([bet_dict[u] for u in range(n)])

    feats = [deg, clo, bet, mob]
    if normalize:
        feats = [standardize(f.reshape(-1, 1)).squeeze(1) for f in feats]
    return np.stack(feats, axis=1).astype(np.float32)


def assemble_evaluator_features(
    node_feats: np.ndarray,
    centrality: np.ndarray,
    with_pretrained_embed: bool,
    with_original_feat: bool,
) -> Tuple[np.ndarray, int]:
    """Build the evaluator's input tensor and ``dim_touched``.

    ``node_feats``: [B, N, 4 demo + E embed + 1 vac_flag] (the loader's
    predictor-mode layout, reference ``pygcn/utils.py:301-311``);
    ``centrality``: [N, 4]. The four modes mirror
    ``pygcn/gnn-over-mlp.py:218-237``: with/without the pretrained embeddings,
    and optionally duplicating the non-flag block so the GCN sees the first
    half (``dim_touched``) while the MLP head also gets the raw copy.
    """
    b = node_feats.shape[0]
    cent = np.broadcast_to(centrality[None], (b,) + centrality.shape)
    vac_flag = node_feats[:, :, -1:]
    base = node_feats[:, :, :-1] if with_pretrained_embed else node_feats[:, :, :4]

    block = np.concatenate([base, cent], axis=2)
    if with_original_feat:
        out = np.concatenate([block, block, vac_flag], axis=2)
        dim_touched = block.shape[2]
    else:
        out = np.concatenate([block, vac_flag], axis=2)
        dim_touched = out.shape[2] - 1
    return out.astype(np.float32), dim_touched


def generator_features(
    gen_node_feats: np.ndarray, centrality: np.ndarray, tile: int = 2
) -> Tuple[np.ndarray, int]:
    """Generator-mode features: [N, F] demographics+embeddings + centralities,
    tiled ×2 (the policy scripts duplicate the feature block, reference
    ``pygcn/policy-generator.py:294-343``); returns (feats, dim_touched)."""
    block = np.concatenate([gen_node_feats, centrality], axis=1)
    out = np.concatenate([block] * tile, axis=1)
    return out.astype(np.float32), block.shape[1]
