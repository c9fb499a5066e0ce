"""Immutable graph containers for the TPU sparse engine.

Design notes
------------
A :class:`Graph` is a frozen pytree holding a weighted sparse adjacency in up to
three physical layouts, each feeding a different SpMM implementation:

- **COO** (``senders``/``receivers``/``weights``, receiver-sorted, zero-padded to a
  static edge budget) → the XLA gather + ``segment_sum`` path. Always present.
- **dense** (``[N, N]``) → a plain MXU matmul; built for small graphs where the
  densification cost is dwarfed by MXU throughput.
- **BCSR** (nonzero ``TM×TK`` tiles + tile coordinates) → the Pallas block-sparse
  MXU kernel; built when the graph's tile fill-in fits a memory budget.

Construction happens host-side with NumPy/SciPy (this is preprocessing, not the
compute path); the stored arrays are ``jax.numpy`` arrays ready for device use.

The reference this framework re-implements keeps its adjacency as a single dense
``torch.FloatTensor`` fed to ``torch.spmm`` (see reference ``pygcn/layers.py:34``,
``pygcn/utils.py:131``); here the layout is chosen per-graph to map onto the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

# Edge buffers are padded to a multiple of this so minor edits don't retrace.
EDGE_PAD = 512

# Measured layout-by-scale policy (PERF_NOTES.md, real v5e):
#   - dense MXU matmul up to ``dense_max_nodes`` (8192);
#   - hybrid BCSR+ELL in the 8K..~1M band (clustered arxiv: 547-554M edges/s
#     vs 228M plain ELL; degenerates gracefully to ELL when no tile
#     qualifies, so it is safe as a default);
#   - ColPanelELL pw=64K above ~1M rows, where XLA's gather row rate
#     collapses with table size (products 2.45M nodes: 171M edges/s vs 45M
#     flat ELL, and the hybrid's tiles LOSE outright at that occupancy);
#   - diagonal panels never by default (lose below ~1M; colpanel supersedes
#     above).
# ``from_coo`` applies this automatically when the build flags are left
# unset; every threshold is overridable per call.
COLPANEL_MIN_NODES = 1_000_000


@dataclasses.dataclass(frozen=True)
class BCSR:
    """Block-sparse CSR: only nonzero ``tm×tk`` tiles are materialized.

    ``data[i]`` is the dense tile at block coordinates
    ``(block_rows[i], block_cols[i])``; tiles are sorted by block row, and
    ``block_row_ptr`` delimits each block row's tile run (CSR over tiles).
    """

    data: jax.Array  # [T, tm, tk] dense tile values
    block_rows: jax.Array  # [T] int32
    block_cols: jax.Array  # [T] int32
    block_row_ptr: jax.Array  # [n_block_rows + 1] int32
    tm: int
    tk: int
    n_block_rows: int
    n_block_cols: int


jax.tree_util.register_dataclass(
    BCSR,
    data_fields=["data", "block_rows", "block_cols", "block_row_ptr"],
    meta_fields=["tm", "tk", "n_block_rows", "n_block_cols"],
)


@dataclasses.dataclass(frozen=True)
class Graph:
    """A weighted directed graph with ``n_nodes`` nodes.

    ``receivers`` are the *destination* rows of the adjacency: an SpMM
    ``y = A @ x`` computes ``y[r] += w * x[s]`` for each edge ``(s, r, w)``.
    Edge arrays are padded to a static size; padding edges have weight 0 and
    endpoints 0, so they contribute nothing.
    """

    senders: jax.Array  # [E_pad] int32 (column indices of A)
    receivers: jax.Array  # [E_pad] int32 (row indices of A), sorted
    weights: jax.Array  # [E_pad] float
    dense: Optional[jax.Array]  # [N, N] densified adjacency, or None
    bcsr: Optional[BCSR]
    bcsr_t: Optional[BCSR]  # BCSR of A^T (for the backward SpMM)
    ell: Optional[object]  # bucketed-ELL layout (ops/ell.py)
    ell_t: Optional[object]  # transpose ELL for the backward SpMM
    hybrid: Optional[object]  # BCSR+ELL hybrid layout (ops/hybrid.py)
    hybrid_t: Optional[object]  # transpose hybrid for the backward SpMM
    n_nodes: int
    n_edges: int  # true edge count, before padding
    is_symmetric: bool
    panel: Optional[object] = None  # diagonal-panel ELL (ops/panel.py)
    panel_t: Optional[object] = None  # transpose panels for the backward SpMM
    colpanel: Optional[object] = None  # column-panel ELL (ops/colpanel.py)
    colpanel_t: Optional[object] = None  # transpose column panels
    # Layout-shaping build kwargs as a hashable (key, value) tuple so
    # ``transpose()`` rebuilds with the SAME hyperparameters (panel_width,
    # hybrid residual/budget, ell_ks, ...) the caller chose — not defaults.
    build_meta: tuple = ()

    # ------------------------------------------------------------------ #
    # Constructors (host-side preprocessing)
    # ------------------------------------------------------------------ #

    @staticmethod
    def from_coo(
        senders,
        receivers,
        weights=None,
        *,
        n_nodes: int,
        is_symmetric: bool = False,
        build_dense: Optional[bool] = None,
        build_bcsr: Optional[bool] = None,
        build_ell: Optional[bool] = None,
        build_hybrid: Optional[bool] = None,
        build_panel: bool = False,
        build_colpanel: Optional[bool] = None,
        panel_width: int = 65536,
        hybrid_min_edges_per_tile: int = 128,
        hybrid_tile_budget_bytes: Optional[int] = 512 * 1024**2,
        hybrid_residual: str = "ell",
        hybrid_tile_dtype=None,
        ell_ks: tuple[int, ...] = (4, 8, 16, 32, 64, 128, 256),
        tile: tuple[int, int] = (128, 128),
        bcsr_budget_bytes: int = 2 * 1024**3,
        dense_max_nodes: int = 8192,
        colpanel_min_nodes: int = COLPANEL_MIN_NODES,
        dtype=np.float32,
    ) -> "Graph":
        """Build a :class:`Graph` from host-side COO arrays.

        Unset build flags follow the measured layout-by-scale policy (see
        ``COLPANEL_MIN_NODES`` and PERF_NOTES.md): dense up to
        ``dense_max_nodes``, hybrid BCSR+ELL in the mid band, ColPanelELL
        above ~1M rows. ``build_bcsr`` defaults to whether the materialized
        tiles fit ``bcsr_budget_bytes``. Every flag remains an explicit
        override.
        """
        senders = np.asarray(senders, dtype=np.int64)
        receivers = np.asarray(receivers, dtype=np.int64)
        if weights is None:
            weights = np.ones(senders.shape[0], dtype=dtype)
        weights = np.asarray(weights, dtype=dtype)
        if senders.shape != receivers.shape or senders.shape != weights.shape:
            raise ValueError("senders/receivers/weights must have equal shapes")
        n_edges = int(senders.shape[0])

        # Receiver-major sort gives segment_sum sorted segments and makes the
        # CSR/BCSR derivations a cheap pass.
        order = np.lexsort((senders, receivers))
        senders = senders[order]
        receivers = receivers[order]
        weights = weights[order]

        e_pad = max(EDGE_PAD, -(-n_edges // EDGE_PAD) * EDGE_PAD)
        pad = e_pad - n_edges
        if pad:
            senders = np.concatenate([senders, np.zeros(pad, np.int64)])
            receivers = np.concatenate([receivers, np.zeros(pad, np.int64)])
            weights = np.concatenate([weights, np.zeros(pad, dtype)])

        coo = sp.coo_matrix(
            (weights[:n_edges], (receivers[:n_edges], senders[:n_edges])),
            shape=(n_nodes, n_nodes),
            dtype=dtype,
        )

        if build_dense is None:
            build_dense = n_nodes <= dense_max_nodes
        dense = jnp.asarray(coo.toarray()) if build_dense else None

        # Layout-by-scale auto-policy (module doc at COLPANEL_MIN_NODES):
        # colpanel above ~1M rows, hybrid in the 8K..1M band. The global ELL
        # is skipped when colpanel is chosen — at that scale the full-table
        # gather path is the measured 3.8x-slower default the policy exists
        # to avoid, and its build costs ~a minute + ~700 MB at products
        # scale. All three remain explicit overrides.
        if build_colpanel is None:
            build_colpanel = (not build_dense) and n_nodes > colpanel_min_nodes
        if build_hybrid is None:
            build_hybrid = not build_dense and not build_colpanel

        if build_bcsr is None:
            build_bcsr = _bcsr_fits(coo, tile, bcsr_budget_bytes)
        bcsr = _build_bcsr(coo, tile) if build_bcsr else None
        bcsr_t = None
        if build_bcsr and not is_symmetric:
            bcsr_t = _build_bcsr(coo.T.tocoo(), tile)

        # ELL is the default fallback for graphs too large/sparse to densify
        # (and the hybrid's residual side needs its builders anyway); above
        # the colpanel threshold it is skipped by default (see above).
        if build_ell is None:
            build_ell = not build_dense and not build_colpanel
        ell = ell_t = None
        if build_ell:
            from pygcn_tpu.ops.ell import build_ell as _mk_ell

            ell = _mk_ell(coo, ell_ks)
            ell_t = ell if is_symmetric else _mk_ell(coo.T.tocsr(), ell_ks)

        # Hybrid routes dense tiles to the MXU (2x over ELL on clustered
        # graphs, see PERF_NOTES.md); opt-in because tile memory scales with
        # community density.
        hybrid = hybrid_t = None
        if build_hybrid:
            from pygcn_tpu.ops.hybrid import build_hybrid as _mk_hybrid

            hybrid = _mk_hybrid(
                coo, tile, hybrid_min_edges_per_tile, ell_ks,
                tile_budget_bytes=hybrid_tile_budget_bytes,
                residual=hybrid_residual, panel_width=panel_width,
                tile_dtype=hybrid_tile_dtype,
            )
            hybrid_t = hybrid if is_symmetric else _mk_hybrid(
                coo.T.tocoo(), tile, hybrid_min_edges_per_tile, ell_ks,
                tile_budget_bytes=hybrid_tile_budget_bytes,
                residual=hybrid_residual, panel_width=panel_width,
                tile_dtype=hybrid_tile_dtype,
            )

        # Diagonal-panel ELL: small gather tables for the near-diagonal
        # edges of a locality-ordered graph (the multi-million-node regime
        # where the full-table gather rate collapses — PERF_NOTES products
        # proof); opt-in like hybrid.
        panel = panel_t = None
        if build_panel:
            from pygcn_tpu.ops.panel import build_panel_ell as _mk_panel

            panel = _mk_panel(coo, panel_width, ell_ks)
            panel_t = panel if is_symmetric else _mk_panel(
                coo.T.tocoo(), panel_width, ell_ks
            )

        # Column-panel ELL: every gather hits a small sender slice — the
        # general form of the diagonal panel (off-diagonal edges get small
        # tables too); opt-in, intended for locality-ordered multi-million-
        # node graphs.
        colpanel = colpanel_t = None
        if build_colpanel:
            from pygcn_tpu.ops.colpanel import COLPANEL_KS
            from pygcn_tpu.ops.colpanel import build_col_panel_ell as _mk_cp

            # colpanel uses its own FINE bucket ladder (per-panel degrees
            # are small; the shared ell_ks ladder wastes 44% of slots at
            # products scale — 1.73x measured, see ops/colpanel.py)
            colpanel = _mk_cp(coo, panel_width, COLPANEL_KS)
            colpanel_t = colpanel if is_symmetric else _mk_cp(
                coo.T.tocsr(), panel_width, COLPANEL_KS
            )

        build_meta = (
            ("panel_width", panel_width),
            ("hybrid_min_edges_per_tile", hybrid_min_edges_per_tile),
            ("hybrid_tile_budget_bytes", hybrid_tile_budget_bytes),
            ("hybrid_residual", hybrid_residual),
            ("hybrid_tile_dtype", hybrid_tile_dtype),
            ("ell_ks", tuple(ell_ks)),
            ("tile", tuple(tile)),
            ("bcsr_budget_bytes", bcsr_budget_bytes),
            ("dense_max_nodes", dense_max_nodes),
        )

        return Graph(
            senders=jnp.asarray(senders, jnp.int32),
            receivers=jnp.asarray(receivers, jnp.int32),
            weights=jnp.asarray(weights),
            dense=dense,
            bcsr=bcsr,
            bcsr_t=bcsr_t,
            ell=ell,
            ell_t=ell_t,
            hybrid=hybrid,
            hybrid_t=hybrid_t,
            n_nodes=int(n_nodes),
            n_edges=n_edges,
            is_symmetric=bool(is_symmetric),
            panel=panel,
            panel_t=panel_t,
            colpanel=colpanel,
            colpanel_t=colpanel_t,
            build_meta=build_meta,
        )

    @staticmethod
    def from_scipy(mat: sp.spmatrix, **kwargs) -> "Graph":
        coo = mat.tocoo()
        return Graph.from_coo(
            coo.col, coo.row, coo.data, n_nodes=coo.shape[0], **kwargs
        )

    # ------------------------------------------------------------------ #

    def transpose(self) -> "Graph":
        """A^T as a new Graph (host-side reshuffle)."""
        if self.is_symmetric:
            return self
        senders = np.asarray(self.senders[: self.n_edges])
        receivers = np.asarray(self.receivers[: self.n_edges])
        weights = np.asarray(self.weights[: self.n_edges])
        return Graph.from_coo(
            receivers,
            senders,
            weights,
            n_nodes=self.n_nodes,
            build_dense=self.dense is not None,
            build_bcsr=self.bcsr is not None,
            build_ell=self.ell is not None,
            build_hybrid=self.hybrid is not None,
            build_panel=self.panel is not None,
            build_colpanel=self.colpanel is not None,
            **dict(self.build_meta),
        )

    def to_scipy(self) -> sp.coo_matrix:
        e = self.n_edges
        return sp.coo_matrix(
            (
                np.asarray(self.weights[:e]),
                (np.asarray(self.receivers[:e]), np.asarray(self.senders[:e])),
            ),
            shape=(self.n_nodes, self.n_nodes),
        )

    @property
    def e_pad(self) -> int:
        return int(self.senders.shape[0])


jax.tree_util.register_dataclass(
    Graph,
    data_fields=["senders", "receivers", "weights", "dense", "bcsr", "bcsr_t", "ell", "ell_t", "hybrid", "hybrid_t", "panel", "panel_t", "colpanel", "colpanel_t"],
    meta_fields=["n_nodes", "n_edges", "is_symmetric", "build_meta"],
)


# ---------------------------------------------------------------------- #
# BCSR construction
# ---------------------------------------------------------------------- #


def _tile_stats(coo: sp.coo_matrix, tile: tuple[int, int]):
    tm, tk = tile
    br = coo.row // tm
    bc = coo.col // tk
    n_block_rows = -(-coo.shape[0] // tm)
    tile_ids = br * np.int64(-(-coo.shape[1] // tk)) + bc
    uniq = np.unique(tile_ids)
    return uniq, n_block_rows


def _bcsr_fits(coo: sp.coo_matrix, tile, budget_bytes: int) -> bool:
    if coo.nnz == 0:
        return False
    uniq, _ = _tile_stats(coo, tile)
    return uniq.size * tile[0] * tile[1] * 4 <= budget_bytes


def _build_bcsr(coo: sp.coo_matrix, tile: tuple[int, int]) -> BCSR:
    """Materialize the nonzero tiles of ``coo`` (row-major tile order)."""
    tm, tk = tile
    n, m = coo.shape
    n_block_rows = -(-n // tm)
    n_block_cols = -(-m // tk)

    br = (coo.row // tm).astype(np.int64)
    bc = (coo.col // tk).astype(np.int64)
    tile_ids = br * n_block_cols + bc
    uniq = np.unique(tile_ids)
    # The Pallas kernel zero-initialises an output block only when visiting the
    # first tile of its block row — every block row must own >= 1 tile, so give
    # empty block rows an all-zero tile at block-column 0.
    empty_rows = np.setdiff1d(np.arange(n_block_rows, dtype=np.int64), uniq // n_block_cols)
    if empty_rows.size:
        uniq = np.sort(np.concatenate([uniq, empty_rows * n_block_cols]))
    inverse = np.searchsorted(uniq, tile_ids)
    t = uniq.size

    data = np.zeros((t, tm, tk), dtype=coo.data.dtype)
    np.add.at(data, (inverse, coo.row % tm, coo.col % tk), coo.data)

    block_rows = (uniq // n_block_cols).astype(np.int32)
    block_cols = (uniq % n_block_cols).astype(np.int32)
    block_row_ptr = np.zeros(n_block_rows + 1, dtype=np.int32)
    np.add.at(block_row_ptr, block_rows + 1, 1)
    block_row_ptr = np.cumsum(block_row_ptr).astype(np.int32)

    return BCSR(
        data=jnp.asarray(data),
        block_rows=jnp.asarray(block_rows),
        block_cols=jnp.asarray(block_cols),
        block_row_ptr=jnp.asarray(block_row_ptr),
        tm=tm,
        tk=tk,
        n_block_rows=n_block_rows,
        n_block_cols=n_block_cols,
    )
