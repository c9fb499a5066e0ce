"""Hybrid BCSR + ELL SpMM — MXU tiles for dense regions, gather for the rest.

Measured per-edge costs on a v5e (PERF_NOTES.md): Pallas BCSR processes a
128×128 tile in ~0.4 µs regardless of fill, while the ELL gather path costs
~4.1 ns/edge — so a tile pays for itself above ~100 edges (0.6% fill). On
graphs with community structure (real-world graphs after Louvain ordering,
co-visitation graphs), a significant edge share concentrates in such tiles.

``build_hybrid`` routes tiles with ≥ ``min_edges_per_tile`` edges to a BCSR
layout and the residual edges to bucketed ELL; ``hybrid_spmm`` adds the two
partial products. Symmetric graphs reuse the forward layouts for the
backward (custom VJP); asymmetric graphs prebuild transposes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from pygcn_tpu.graph.graph import BCSR, _build_bcsr
from pygcn_tpu.ops.ell import ELL, build_ell, ell_spmm_raw


@dataclasses.dataclass(frozen=True)
class HybridLayout:
    bcsr: Optional[BCSR]  # None when no tile is dense enough
    ell: ELL  # residual edges (all edges if bcsr is None)
    n_rows: int
    tile_edges: int  # edges routed to BCSR (diagnostics)


jax.tree_util.register_dataclass(
    HybridLayout, data_fields=["bcsr", "ell"], meta_fields=["n_rows", "tile_edges"]
)


def build_hybrid(
    mat: sp.spmatrix,
    tile: Tuple[int, int] = (128, 128),
    min_edges_per_tile: int = 128,
    ks: Tuple[int, ...] = (4, 8, 16, 32, 64, 128, 256),
    tile_budget_bytes: Optional[int] = None,
    residual: str = "ell",
    panel_width: int = 65536,
    tile_dtype=None,
) -> HybridLayout:
    """Route tiles with ≥ ``min_edges_per_tile`` edges to BCSR, rest to ELL.

    ``tile_budget_bytes`` caps the dense-tile memory (each tile stores
    ``tm*tk`` f32 values): when qualifying tiles exceed the budget, the
    densest tiles are kept (best edges-per-byte first) and the rest spill
    to the ELL side.

    ``residual="colpanel"`` stores the non-tile edges as a column-panel ELL
    (``ops/colpanel.py``) so their gathers hit ``panel_width``-sized feature
    slices instead of the full table — the gather rate is table-size-bound
    on TPU (PERF_NOTES.md), so on locality-ordered multi-hundred-K-node
    graphs this is the faster residual.
    """
    coo = mat.tocoo()
    n = coo.shape[0]
    tm, tk = tile
    n_block_cols = -(-coo.shape[1] // tk)

    tile_ids = (coo.row // tm).astype(np.int64) * n_block_cols + coo.col // tk
    uniq, inverse, counts = np.unique(tile_ids, return_inverse=True, return_counts=True)
    qualifies = counts >= min_edges_per_tile
    if tile_budget_bytes is not None:
        tile_bytes = tm * tk * 4
        max_tiles = max(0, tile_budget_bytes // tile_bytes)
        if int(qualifies.sum()) > max_tiles:
            order = np.argsort(-counts)  # densest first
            keep = np.zeros_like(qualifies)
            kept = order[qualifies[order]][:max_tiles]
            keep[kept] = True
            qualifies = keep
    dense_tile = qualifies[inverse]

    tile_edges = int(dense_tile.sum())
    bcsr = None
    if tile_edges:
        dense_part = sp.coo_matrix(
            (coo.data[dense_tile], (coo.row[dense_tile], coo.col[dense_tile])),
            shape=coo.shape,
        )
        bcsr = _build_bcsr(dense_part, tile)
        if tile_dtype is not None:
            # bf16 tile storage: 13x on the products-scale kernel and half
            # the HBM working set (PERF_NOTES r4); the kernel keeps an f32
            # MXU accumulator, so the only loss is input rounding (~2e-3
            # relative on normalized adjacency weights).
            import dataclasses

            bcsr = dataclasses.replace(
                bcsr, data=bcsr.data.astype(jnp.dtype(tile_dtype)))
        rest_mask = ~dense_tile
    else:
        rest_mask = np.ones(coo.nnz, bool)

    rest = sp.csr_matrix(
        (coo.data[rest_mask], (coo.row[rest_mask], coo.col[rest_mask])), shape=coo.shape
    )
    if residual == "colpanel":
        from pygcn_tpu.ops.colpanel import build_col_panel_ell

        rest_layout = build_col_panel_ell(rest, panel_width, ks)
    elif residual == "ell":
        rest_layout = build_ell(rest, ks)
    else:
        raise ValueError(f"unknown residual layout {residual!r}")
    return HybridLayout(
        bcsr=bcsr, ell=rest_layout, n_rows=n, tile_edges=tile_edges
    )


def hybrid_spmm_raw(h: HybridLayout, x: jax.Array) -> jax.Array:
    if isinstance(h.ell, ELL):
        out = ell_spmm_raw(h.ell, x)
    else:  # ColPanelELL residual
        from pygcn_tpu.ops.colpanel import col_panel_spmm_raw

        out = col_panel_spmm_raw(h.ell, x)
    if h.bcsr is not None:
        from pygcn_tpu.ops.pallas.bcsr_spmm import bcsr_spmm

        out = out + bcsr_spmm(h.bcsr, x, n_rows=h.n_rows)
    return out


@jax.custom_vjp
def hybrid_spmm_pair(h: HybridLayout, h_t: HybridLayout, x: jax.Array) -> jax.Array:
    """``A @ x`` with backward ``A^T @ g`` on the transpose layout."""
    return hybrid_spmm_raw(h, x)


def _fwd(h, h_t, x):
    return hybrid_spmm_raw(h, x), (h, h_t)


def _bwd(res, g):
    h, h_t = res
    dx = hybrid_spmm_raw(h_t, g)
    zeros = lambda e: jax.tree.map(jnp.zeros_like, e)
    return zeros(h), zeros(h_t), dx


hybrid_spmm_pair.defvjp(_fwd, _bwd)
