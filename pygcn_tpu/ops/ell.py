"""Bucketed-ELL SpMM — the fast TPU path for power-law graphs.

Profiling on a v5e (arxiv-scale power-law graph, H=128, f32) shows the
gather+segment COO path is dominated by the per-edge scatter-add:

====================  ========  ============
path                  time      bottleneck
====================  ========  ============
gather x[senders]      3.2 ms   368 GB/s (fine)
segment_sum (E ids)   ~21 ms    per-edge scatter
====================  ========  ============

This layout removes the per-edge scatter. Rows are binned into power-of-two
degree buckets; each bucket stores a dense ``[Nb, K]`` column/value block
("ELL"), so aggregation is gather + a length-K reduction with **contiguous
output**. Rows wider than the largest K are split into virtual rows. The only
remaining scatter is the final ``segment_sum`` over ~N virtual-row partials
(≈13× fewer ids than edges here).

Backward uses a prebuilt transpose-ELL (symmetric graphs reuse the forward
layout) via ``custom_vjp`` — without it, autodiff of the gather would
reintroduce the per-edge scatter.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


@dataclasses.dataclass(frozen=True)
class ELL:
    """Per-bucket ``(cols [Nb·K], vals [Nb·K], rows [Nb])`` blocks.

    ``cols``/``vals`` are stored FLAT (1-D, row-major over the logical
    ``[Nb, K]`` block): any 2-D array with a trailing dim < 128 pads to the
    TPU ``(8, 128)`` tile, so a ``[Nb, 4]`` int32 bucket costs 32x its
    logical bytes — the measured cause of the 25.2 GiB HLO copies / OOM at
    ogbn-products scale that ``ops/colpanel.py`` first diagnosed. Flat
    arrays are tile-free; only gathered ``[Nb·K, H]`` activations (lane-
    aligned) are ever 2-D. The logical ``K`` of bucket ``j`` is ``ks[j]``
    (equivalently ``cols[j].size // rows[j].size``)."""

    cols: Tuple[jax.Array, ...]
    vals: Tuple[jax.Array, ...]
    rows: Tuple[jax.Array, ...]
    ks: Tuple[int, ...]
    n_rows: int


jax.tree_util.register_dataclass(
    ELL, data_fields=["cols", "vals", "rows"], meta_fields=["ks", "n_rows"]
)


def build_ell(mat: sp.spmatrix, ks: Tuple[int, ...] = (4, 8, 16, 32, 64, 128, 256)) -> ELL:
    csr = mat.tocsr()
    n = csr.shape[0]
    indptr, indices, data = csr.indptr, csr.indices, csr.data.astype(np.float32)

    # prefer the native graphkit layout builder when available
    from pygcn_tpu.utils import native

    if native.available():
        built = native.build_ell_layout(indptr, indices, data, ks)
        if built is not None:
            cols, vals, rows = built
            return ELL(
                cols=tuple(jnp.asarray(c.reshape(-1)) for c in cols),
                vals=tuple(jnp.asarray(v.reshape(-1)) for v in vals),
                rows=tuple(jnp.asarray(r) for r in rows),
                ks=tuple(ks),
                n_rows=n,
            )
    deg = np.diff(indptr).astype(np.int64)
    kmax = ks[-1]

    # virtual rows: rows wider than kmax split into ceil(deg/kmax) chunks
    n_chunks = np.maximum(1, -(-deg // kmax))
    vrow_row = np.repeat(np.arange(n, dtype=np.int64), n_chunks)
    first = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
    chunk_ofs = np.arange(vrow_row.size) - np.repeat(first, n_chunks)
    vstart = indptr[vrow_row] + chunk_ofs * kmax
    vlen = np.minimum(deg[vrow_row] - chunk_ofs * kmax, kmax)
    bucket = np.searchsorted(ks, np.maximum(vlen, 1))

    cols_out, vals_out, rows_out = [], [], []
    for j, k in enumerate(ks):
        sel = np.nonzero(bucket == j)[0]
        if sel.size == 0:
            cols_out.append(jnp.zeros(k, jnp.int32))
            vals_out.append(jnp.zeros(k, jnp.float32))
            rows_out.append(jnp.zeros(1, jnp.int32))
            continue
        offs = np.arange(k)
        idx = vstart[sel][:, None] + offs
        valid = offs < vlen[sel][:, None]
        idx = np.minimum(idx, max(len(indices) - 1, 0))
        cols = np.where(valid, indices[idx] if len(indices) else 0, 0)
        vals = np.where(valid, data[idx] if len(data) else 0.0, 0.0)
        cols_out.append(jnp.asarray(cols.astype(np.int32).reshape(-1)))
        vals_out.append(jnp.asarray(vals.astype(np.float32).reshape(-1)))
        rows_out.append(jnp.asarray(vrow_row[sel].astype(np.int32)))

    return ELL(
        cols=tuple(cols_out), vals=tuple(vals_out), rows=tuple(rows_out),
        ks=ks, n_rows=n,
    )


H_CHUNK = 128  # gather cost is per-row and flat up to 512 B/row, with a
# cliff above (see PERF_NOTES.md): split wide feature matrices into
# 128-column chunks so every gather row stays <= 512 B.

# Max f32 elements in one bucket's gathered [rows, k, H] intermediate before
# the rows are processed in lax.map chunks. XLA materializes the gathered
# messages when its gather+reduce fusion gives up, which at ogbn-products
# scale (62M slots x H=128 = 32 GB) exceeds HBM; chunking bounds the live
# intermediate to ~4 GiB while arxiv-scale graphs (0.74G elems) stay on the
# measured unchunked path.
ELL_CHUNK_BUDGET_ELEMS = 1 << 30


def _bucket_partial(x: jax.Array, cols: jax.Array, vals: jax.Array, k: int) -> jax.Array:
    """One bucket's per-virtual-row partial sums ``[nb, H]`` from FLAT
    ``[nb·k]`` cols/vals (see the ELL docstring for why flat).

    Compute SHAPE stays 3-D ``[nb, k, h]`` with the value multiply after
    the reshape: the flat ``take(x, cols) * vals[:, None]`` form measured
    2.0x SLOWER at ogbn-products scale (2676 vs 1336 ms — the elementwise
    consumer on the [nb·k, H] gather broke XLA's gather+reduce fusion and
    materialized both buffers); reshape-first reproduces the fused r2 form
    while the STORAGE stays tile-free."""
    h = x.shape[1]
    nb = cols.shape[0] // k
    if cols.shape[0] * h <= ELL_CHUNK_BUDGET_ELEMS:
        g = jnp.take(x, cols, axis=0).reshape(nb, k, h)
        return (g * vals.reshape(nb, k)[..., None]).sum(axis=1)
    rows_per_chunk = max(1, ELL_CHUNK_BUDGET_ELEMS // (k * h))
    n_chunks = -(-nb // rows_per_chunk)
    pad = n_chunks * rows_per_chunk - nb
    cols_p = jnp.pad(cols, (0, pad * k)).reshape(n_chunks, rows_per_chunk * k)
    vals_p = jnp.pad(vals, (0, pad * k)).reshape(n_chunks, rows_per_chunk * k)

    def body(cv):
        c, v = cv
        g = jnp.take(x, c, axis=0).reshape(rows_per_chunk, k, h)
        return (g * v.reshape(rows_per_chunk, k)[..., None]).sum(axis=1)

    out = jax.lax.map(body, (cols_p, vals_p))
    return out.reshape(n_chunks * rows_per_chunk, h)[:nb]


def ell_spmm_raw(ell: ELL, x: jax.Array) -> jax.Array:
    """``A @ x`` without custom VJP (autodiff reintroduces edge scatters)."""
    if x.shape[1] > H_CHUNK:
        return jnp.concatenate(
            [ell_spmm_raw(ell, x[:, i : i + H_CHUNK])
             for i in range(0, x.shape[1], H_CHUNK)],
            axis=1,
        )
    partials = []
    vrows = []
    for cols, vals, rows, k in zip(ell.cols, ell.vals, ell.rows, ell.ks):
        partials.append(_bucket_partial(x, cols, vals, k))
        vrows.append(rows)
    p = jnp.concatenate(partials, axis=0)
    r = jnp.concatenate(vrows, axis=0)
    return jax.ops.segment_sum(p, r, num_segments=ell.n_rows)


@jax.custom_vjp
def ell_spmm_pair(ell: ELL, ell_t: ELL, x: jax.Array) -> jax.Array:
    """``A @ x`` with backward ``A^T @ g`` running the transpose layout."""
    return ell_spmm_raw(ell, x)


def _fwd(ell, ell_t, x):
    return ell_spmm_raw(ell, x), (ell, ell_t)


def _bwd(res, g):
    ell, ell_t = res
    dx = ell_spmm_raw(ell_t, g)
    zeros = lambda e: jax.tree.map(jnp.zeros_like, e)
    return zeros(ell), zeros(ell_t), dx


ell_spmm_pair.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------- #
# Hub-split ELL: route high-traffic senders through a small gather table
# ---------------------------------------------------------------------- #


@dataclasses.dataclass(frozen=True)
class SplitELL:
    """Two-table ELL: gathers from a table ≤ ~16K rows run ~2.5-3x faster on
    TPU than from full-graph tables (see PERF_NOTES.md), so the most-referenced
    sender columns ("hubs") are compacted into a small table gathered per call.
    On power-law graphs hubs carry a large share of edges."""

    hub: ELL  # cols index into the compacted hub table
    rest: ELL  # cols index into the full feature matrix
    hub_ids: jax.Array  # [n_hubs] global ids of hub senders
    n_rows: int


jax.tree_util.register_dataclass(
    SplitELL, data_fields=["hub", "rest", "hub_ids"], meta_fields=["n_rows"]
)


def build_split_ell(
    mat: sp.spmatrix,
    n_hubs: int = 16384,
    ks: Tuple[int, ...] = (4, 8, 16, 32, 64, 128, 256),
) -> SplitELL:
    csr = mat.tocsr()
    n = csr.shape[0]
    n_hubs = min(n_hubs, n)
    # hubs = most-referenced sender columns
    col_counts = np.bincount(csr.indices, minlength=n)
    hub_ids = np.sort(np.argsort(-col_counts)[:n_hubs])
    hub_local = np.full(n, -1, np.int64)
    hub_local[hub_ids] = np.arange(n_hubs)

    is_hub = hub_local[csr.indices] >= 0
    coo = csr.tocoo()
    rows, cols, data = coo.row, coo.col, coo.data

    def sub(mask, col_map, width):
        m = sp.csr_matrix(
            (data[mask], (rows[mask], col_map[cols[mask]])), shape=(n, width)
        )
        return build_ell(m, ks)

    hub_ell = sub(is_hub, hub_local, n_hubs)
    rest_ell = sub(~is_hub, np.arange(n, dtype=np.int64), n)
    return SplitELL(
        hub=hub_ell, rest=rest_ell,
        hub_ids=jnp.asarray(hub_ids.astype(np.int32)), n_rows=n,
    )


def split_ell_spmm_raw(sell: SplitELL, x: jax.Array) -> jax.Array:
    if x.shape[1] > H_CHUNK:
        return jnp.concatenate(
            [split_ell_spmm_raw(sell, x[:, i : i + H_CHUNK])
             for i in range(0, x.shape[1], H_CHUNK)],
            axis=1,
        )
    x_hub = jnp.take(x, sell.hub_ids, axis=0)
    partials, vrows = [], []
    for ell, src in ((sell.hub, x_hub), (sell.rest, x)):
        for cols, vals, rws, k in zip(ell.cols, ell.vals, ell.rows, ell.ks):
            nb = rws.shape[0]
            g = jnp.take(src, cols, axis=0).reshape(nb, k, x.shape[1])
            partials.append((g * vals.reshape(nb, k)[..., None]).sum(axis=1))
            vrows.append(rws)
    p = jnp.concatenate(partials, axis=0)
    r = jnp.concatenate(vrows, axis=0)
    return jax.ops.segment_sum(p, r, num_segments=sell.n_rows)


def build_ell_stacked(mats, ks: Tuple[int, ...] = (4, 8, 16, 32, 64, 128, 256)):
    """Build shard-uniform stacked ELL layouts for a list of equally-shaped
    sparse matrices (one per device shard): per bucket, ``cols/vals`` become
    FLAT ``[P, Nb_max·K]`` and ``rows`` ``[P, Nb_max]`` with per-shard
    padding to the max block count, so the arrays shard cleanly over a mesh
    axis (flat for the same tile-padding reason as :class:`ELL`).
    """
    built = [build_ell(m, ks) for m in mats]
    n_rows = built[0].n_rows
    cols_out, vals_out, rows_out = [], [], []
    for j, k in enumerate(ks):
        nb_max = max(e.rows[j].shape[0] for e in built)
        cols = np.zeros((len(mats), nb_max * k), np.int32)
        vals = np.zeros((len(mats), nb_max * k), np.float32)
        rows = np.zeros((len(mats), nb_max), np.int32)
        for p, e in enumerate(built):
            nb = e.rows[j].shape[0]
            cols[p, : nb * k] = np.asarray(e.cols[j])
            vals[p, : nb * k] = np.asarray(e.vals[j])
            rows[p, :nb] = np.asarray(e.rows[j])
        cols_out.append(jnp.asarray(cols))
        vals_out.append(jnp.asarray(vals))
        rows_out.append(jnp.asarray(rows))
    return tuple(cols_out), tuple(vals_out), tuple(rows_out), n_rows


def ell_apply_arrays(cols, vals, rows, n_rows: int, x: jax.Array) -> jax.Array:
    """Run the ELL gather+reduce+combine given raw per-bucket FLAT arrays
    (``cols/vals`` ``[nb·k]``, ``rows`` ``[nb]`` — the shard-local compute
    inside ``shard_map``; see ``parallel/dist_spmm.py``)."""
    partials, vrows = [], []
    for c, v, r in zip(cols, vals, rows):
        nb = r.shape[0]
        k = c.shape[0] // nb
        g = jnp.take(x, c, axis=0).reshape(nb, k, x.shape[1])
        partials.append((g * v.reshape(nb, k)[..., None]).sum(axis=1))
        vrows.append(r)
    p = jnp.concatenate(partials, axis=0)
    r = jnp.concatenate(vrows, axis=0)
    return jax.ops.segment_sum(p, r, num_segments=n_rows)
