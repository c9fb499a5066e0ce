"""Diagonal-panel ELL — small gather tables for community-local edges.

Measured on the v5e, the XLA gather row rate is TABLE-SIZE-bound: ~482M
rows/s against <=16K-row tables, ~320M at 169K rows, ~58M at 2.45M rows
(PERF_NOTES.md — small-table probes and the products-scale proof). On a
locality-ordered graph most edges live near the diagonal, so splitting the
node range into contiguous panels puts each panel's edges against a
panel-sized feature slice: the gathers that carry ~70% of a community
graph's edges run at the small-table rate, and only the off-diagonal
residual pays the full-table rate.

Layout:
- ``panels[p]``: a bucketed ELL of the diagonal block
  ``A[s_p:s_p+w, s_p:s_p+w]`` with PANEL-LOCAL row/col ids;
- ``residual``: one global ELL holding every off-diagonal edge.

``panel_spmm_raw`` computes ``y[s:s+w] += A_p @ x[s:s+w]`` per panel (static
slices, XLA fuses the update-adds) plus the residual product. Backward uses
a prebuilt transpose layout via ``custom_vjp`` exactly like ``ell_spmm_pair``
(symmetric graphs reuse the forward layout: each diagonal block of a
symmetric matrix is itself symmetric).

This is the single-chip analog of the distributed local/halo split
(``parallel/dist_spmm.py``): panel = shard, residual = halo — with HBM
slices in place of ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from pygcn_tpu.ops.ell import ELL, build_ell, ell_spmm_raw


@dataclasses.dataclass(frozen=True)
class PanelELL:
    panels: Tuple[ELL, ...]
    starts: Tuple[int, ...]
    residual: ELL  # off-diagonal edges, global coordinates
    n_rows: int
    diag_edges: int  # edges routed through panels (diagnostics)


jax.tree_util.register_dataclass(
    PanelELL,
    data_fields=["panels", "residual"],
    meta_fields=["starts", "n_rows", "diag_edges"],
)


def build_panel_ell(
    mat: sp.spmatrix,
    panel_width: int = 65536,
    ks: Tuple[int, ...] = (4, 8, 16, 32, 64, 128, 256),
) -> PanelELL:
    coo = mat.tocoo()
    n = coo.shape[0]
    pr = coo.row // panel_width
    pc = coo.col // panel_width
    diag = pr == pc
    n_panels = max(1, -(-n // panel_width))

    panels, starts = [], []
    rows_d, cols_d, data_d = coo.row[diag], coo.col[diag], coo.data[diag]
    order = np.argsort(pr[diag], kind="stable")
    rows_d, cols_d, data_d = rows_d[order], cols_d[order], data_d[order]
    bounds = np.searchsorted(pr[diag][order], np.arange(n_panels + 1))
    for p in range(n_panels):
        s = p * panel_width
        w = min(panel_width, n - s)
        lo, hi = bounds[p], bounds[p + 1]
        sub = sp.csr_matrix(
            (data_d[lo:hi], (rows_d[lo:hi] - s, cols_d[lo:hi] - s)), shape=(w, w)
        )
        panels.append(build_ell(sub, ks))
        starts.append(s)

    rest = sp.csr_matrix(
        (coo.data[~diag], (coo.row[~diag], coo.col[~diag])), shape=(n, n)
    )
    return PanelELL(
        panels=tuple(panels),
        starts=tuple(starts),
        residual=build_ell(rest, ks),
        n_rows=n,
        diag_edges=int(diag.sum()),
    )


def panel_spmm_raw(pe: PanelELL, x: jax.Array) -> jax.Array:
    out = ell_spmm_raw(pe.residual, x)
    for ell_p, s in zip(pe.panels, pe.starts):
        w = ell_p.n_rows
        y = ell_spmm_raw(ell_p, x[s : s + w])
        out = out.at[s : s + w].add(y)
    return out


@jax.custom_vjp
def panel_spmm_pair(pe: PanelELL, pe_t: PanelELL, x: jax.Array) -> jax.Array:
    """``A @ x`` with backward ``A^T @ g`` on the transpose layout."""
    return panel_spmm_raw(pe, x)


def _fwd(pe, pe_t, x):
    return panel_spmm_raw(pe, x), (pe, pe_t)


def _bwd(res, g):
    pe, pe_t = res
    dx = panel_spmm_raw(pe_t, g)
    zeros = lambda e: jax.tree.map(jnp.zeros_like, e)
    return zeros(pe), zeros(pe_t), dx


panel_spmm_pair.defvjp(_fwd, _bwd)
