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
    seed: int = 0,
) -> np.ndarray:
    """[N, 4]: degree, closeness, betweenness, mobility level.

    Degree/closeness/betweenness follow igraph's conventions as used by the
    reference (raw degree counts, closeness over the weighted graph treated as
    unweighted adjacency, exact betweenness); ``betweenness_samples`` enables
    sampled approximation for large graphs.
    """
    import networkx as nx

    adj = np.asarray(adj)
    g = nx.from_numpy_array(adj)
    n = adj.shape[0]

    deg = np.array([d for _, d in g.degree()], np.float64)
    # igraph closeness = (n-1) / sum(shortest path lengths); networkx
    # closeness_centrality matches on connected graphs.
    clo = np.array([nx.closeness_centrality(g, u) for u in range(n)])
    if betweenness_samples is not None and betweenness_samples < n:
        bet_dict = nx.betweenness_centrality(g, k=betweenness_samples, normalized=False, seed=seed)
    else:
        bet_dict = nx.betweenness_centrality(g, normalized=False)
    bet = np.array([bet_dict[u] for u in range(n)])
    mob = adj.sum(axis=1).astype(np.float64)

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
