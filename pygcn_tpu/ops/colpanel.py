"""Column-panel ELL — every gather reads a small sender slice.

Measured on the v5e, XLA's gather row rate is TABLE-SIZE-bound (~482M rows/s
at <=16K-row tables, ~320M at 169K, ~58M at 2.45M — PERF_NOTES.md), which
caps large-graph SpMM far below the per-row latency floor. The diagonal
:mod:`pygcn_tpu.ops.panel` layout fixes this for near-diagonal edges only;
its off-diagonal residual still gathers from the full table. This layout
panels by SENDER RANGE alone: edges are grouped by ``col // panel_width``
into per-panel buckets whose column ids are panel-local, so **every**
edge's gather hits an ``x[s:s+w]`` slice, and the per-virtual-row partials
from all panels combine in one global ``segment_sum``.

Storage is deliberately FLAT: per-panel degrees are small (a row's edges
split across the panels it touches), so almost every slot lands in the
k=4/8 buckets — and a 2-D ``[nb, 4]`` int32 array on TPU pads to the
``(8, 128)`` tile, a 32x memory blowup that OOMs at ogbn-products scale
(measured: 25.2 GiB of HLO copies for a 63M-edge graph). Storing
``cols``/``vals`` as 1-D ``[nb*k]`` arrays keeps them tile-free; only the
gathered ``[nb*k, H]`` activations (lane-aligned) are ever 2-D.

Cost model vs plain ELL: gathers run at the small-table rate for all E
edges; the price is more virtual rows (each row pays one partial per panel
it touches). On a locality-ordered graph most rows touch few panels, so
the extra segment traffic is a few x[N, H]-sized streams — cheap next to
the gather wall. On an UNORDERED graph with hub rows touching every panel
the virtual-row count can approach E and the layout degrades; order first
(``parallel/partition.locality_order``).

The reference's analogous op is the single ``torch.spmm`` call
(reference ``pygcn/layers.py:34``); this layout is a TPU-specific
re-design of its sparsity handling, not a port.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from pygcn_tpu.ops.ell import H_CHUNK, build_ell


@dataclasses.dataclass(frozen=True)
class FlatBuckets:
    """One panel's buckets with FLAT ``[nb*k]`` cols/vals (see module doc)."""

    cols: Tuple[jax.Array, ...]  # 1-D [nb*k], panel-local column ids
    vals: Tuple[jax.Array, ...]  # 1-D [nb*k]
    rows: Tuple[jax.Array, ...]  # [nb], GLOBAL row ids
    ks: Tuple[int, ...]


jax.tree_util.register_dataclass(
    FlatBuckets, data_fields=["cols", "vals", "rows"], meta_fields=["ks"]
)


@dataclasses.dataclass(frozen=True)
class ColPanelELL:
    panels: Tuple[FlatBuckets, ...]
    starts: Tuple[int, ...]
    widths: Tuple[int, ...]
    n_rows: int
    n_vrows: int  # total virtual rows across panels (diagnostics)


jax.tree_util.register_dataclass(
    ColPanelELL,
    data_fields=["panels"],
    meta_fields=["starts", "widths", "n_rows", "n_vrows"],
)


# Fine bucket ladder: per-panel row degrees are SMALL (a row's edges split
# across the panels it touches; products avg 5.0/vrow), so the coarse
# (4, 8, 16, 32, ...) ladder wastes 44% of slots (fill 0.56 at products —
# 113.1M slots for 63.4M edges) where this ladder stores 72.2M (fill
# 0.88). Measured back-to-back in one fast-regime session at products:
# 446 vs 771 ms (1.73x) — and layout BUILD time halves too (r5).
COLPANEL_KS = (1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256)


def build_col_panel_ell(
    mat: sp.spmatrix,
    panel_width: int = 65536,
    ks: Tuple[int, ...] = COLPANEL_KS,
) -> ColPanelELL:
    csc = mat.tocsc()
    n_rows, n_cols = csc.shape
    n_panels = max(1, -(-n_cols // panel_width))
    panels, starts, widths = [], [], []
    n_vrows = 0
    for p in range(n_panels):
        s = p * panel_width
        w = min(panel_width, n_cols - s)
        sub = csc[:, s : s + w].tocsr()
        # build_ell gives every row at least one (zero-valued) slot; rows with
        # no edge in this panel must be compacted away first or the virtual-row
        # count becomes n_rows * n_panels.
        nz = np.flatnonzero(np.diff(sub.indptr))
        if nz.size == 0:
            continue
        ell = build_ell(sub[nz], ks)
        rmap = nz.astype(np.int32)
        panels.append(
            FlatBuckets(
                cols=tuple(jnp.asarray(np.asarray(c).reshape(-1)) for c in ell.cols),
                vals=tuple(jnp.asarray(np.asarray(v).reshape(-1)) for v in ell.vals),
                rows=tuple(jnp.asarray(rmap[np.asarray(r)]) for r in ell.rows),
                ks=ell.ks,
            )
        )
        n_vrows += sum(r.shape[0] for r in ell.rows)
        starts.append(s)
        widths.append(w)
    return ColPanelELL(
        panels=tuple(panels), starts=tuple(starts), widths=tuple(widths),
        n_rows=n_rows, n_vrows=n_vrows,
    )


# Per-bucket gathered-intermediate budget. Smaller than the global ELL's:
# at products scale the [n_vrows, H] partial buffer is ~6.5 GiB, so the
# transient gather chunks must stay ~1 GiB for the whole op to fit HBM.
COLPANEL_CHUNK_BUDGET_ELEMS = 1 << 28

# Wrap each panel's x-slice in an optimization_barrier so XLA MATERIALIZES
# it as a fresh small buffer before the gathers. The table-size gather
# speedup needs a genuinely small table — gathering from a slice VIEW of
# the big matrix still runs at (near) the big-table rate. Same-session A/B
# on the v5e at products scale: 901 -> 370 ms (2.44x), and the
# materialized path is reproducible where the view path swings 588-901 ms
# (PERF_NOTES "same-session A/B"). Flag kept for A/B.
MATERIALIZE_PANEL_SLICES = True


def _flat_bucket_partial(x, cols, vals, k: int) -> jax.Array:
    """Per-virtual-row partials ``[nb, H]`` from flat ``[nb*k]`` cols/vals."""
    h = x.shape[1]
    nb = cols.shape[0] // k
    if cols.shape[0] * h <= COLPANEL_CHUNK_BUDGET_ELEMS:
        g = jnp.take(x, cols, axis=0) * vals[:, None]  # [nb*k, H]
        return g.reshape(nb, k, h).sum(axis=1)
    rows_per_chunk = max(1, COLPANEL_CHUNK_BUDGET_ELEMS // (k * h))
    n_chunks = -(-nb // rows_per_chunk)
    pad = n_chunks * rows_per_chunk - nb
    cols_p = jnp.pad(cols, (0, pad * k)).reshape(n_chunks, rows_per_chunk * k)
    vals_p = jnp.pad(vals, (0, pad * k)).reshape(n_chunks, rows_per_chunk * k)

    def body(cv):
        c, v = cv
        g = jnp.take(x, c, axis=0) * v[:, None]
        return g.reshape(rows_per_chunk, k, h).sum(axis=1)

    out = jax.lax.map(body, (cols_p, vals_p))
    return out.reshape(n_chunks * rows_per_chunk, h)[:nb]


# Combine the per-virtual-row partials group-by-group (this many panels per
# group) instead of one global [n_vrows, H] buffer + one segment_sum. At
# products scale the global buffer is ~6.5 GiB of live HBM on top of
# x/out/layout. MEASURED at products: throughput-neutral (373 vs 370 ms —
# the op's own buffer was evidently not the degradation driver), kept for
# the memory headroom it buys at larger-than-products scales (the global
# buffer would grow past HBM at ~2x products). None = global combine.
COLPANEL_GROUP_PANELS = 8

# Gate each group's cols/vals arrays behind an optimization_barrier on the
# running output. The fused bucket kernels index flat [nb*k] vals as
# [nb, k] — XLA materializes that relayout as a padded copy ((8,128) tiles:
# 32x for k=4) and, because the copies depend only on ARGUMENTS, hoists
# every bucket's copy to program start: ~3 GB of coexisting temps in the
# products GCN train step (2.26 GB over HBM, r5 flagship memstats dump).
# Gating scopes each group's copies to its own window; the combine chain
# was already measured throughput-neutral when serialized.
COLPANEL_SERIALIZE_GROUPS = True


def col_panel_spmm_raw(pe: ColPanelELL, x: jax.Array) -> jax.Array:
    """``A @ x`` — per-panel small-table gathers, grouped combines."""
    if x.shape[1] > H_CHUNK:
        return jnp.concatenate(
            [col_panel_spmm_raw(pe, x[:, i : i + H_CHUNK])
             for i in range(0, x.shape[1], H_CHUNK)],
            axis=1,
        )
    if not pe.panels:  # every panel was empty (e.g. an all-tile hybrid residual)
        return jnp.zeros((pe.n_rows, x.shape[1]), x.dtype)
    h = x.shape[1]
    group = COLPANEL_GROUP_PANELS or len(pe.panels)
    out = None
    for g0 in range(0, len(pe.panels), group):
        panels = pe.panels[g0 : g0 + group]
        starts = pe.starts[g0 : g0 + group]
        widths = pe.widths[g0 : g0 + group]
        if COLPANEL_SERIALIZE_GROUPS and out is not None:
            # route the running output through the barrier with the group's
            # cols/vals: scopes their (argument-only, hoistable) 32x-padded
            # relayout copies to this group's window (token-only gating
            # measured WORSE on the attention path — see gat_colpanel._walk)
            flat = [a for fb in panels for a in (*fb.cols, *fb.vals)]
            gated = jax.lax.optimization_barrier((out, *flat))
            out = gated[0]
            it = iter(gated[1:])
            panels = [
                FlatBuckets(
                    cols=tuple(next(it) for _ in fb.cols),
                    vals=tuple(next(it) for _ in fb.vals),
                    rows=fb.rows, ks=fb.ks,
                )
                for fb in panels
            ]
        # Write this group's partials into ONE preallocated buffer at static
        # offsets: XLA aliases the dynamic_update_slice chain in place, where
        # a jnp.concatenate of the partial list kept pieces + copy live
        # together (measured: 811 MB over HBM at ogbn-products scale).
        total = sum(r.shape[0] for fb in panels for r in fb.rows)
        p = jnp.zeros((total, h), x.dtype)
        vrows = []
        ofs = 0
        for fb, s, w in zip(panels, starts, widths):
            # static slice: the panel's entire gather table
            xs = jax.lax.slice_in_dim(x, s, s + w)
            if MATERIALIZE_PANEL_SLICES:
                xs = jax.lax.optimization_barrier(xs)
            for cols, vals, rows, k in zip(fb.cols, fb.vals, fb.rows, fb.ks):
                part = _flat_bucket_partial(xs, cols, vals, k)
                p = jax.lax.dynamic_update_slice(p, part, (ofs, 0))
                ofs += rows.shape[0]
                vrows.append(rows)
        r = jnp.concatenate(vrows, axis=0)
        acc = jax.ops.segment_sum(p, r, num_segments=pe.n_rows)
        out = acc if out is None else out + acc
    return out


@jax.custom_vjp
def col_panel_spmm_pair(pe: ColPanelELL, pe_t: ColPanelELL, x: jax.Array) -> jax.Array:
    """``A @ x`` with backward ``A^T @ g`` on the transpose layout (the
    transpose of a column-panel layout is the column-panel layout of
    ``A^T``; symmetric graphs pass the forward layout twice)."""
    return col_panel_spmm_raw(pe, x)


def _fwd(pe, pe_t, x):
    return col_panel_spmm_raw(pe, x), (pe, pe_t)


def _bwd(res, g):
    pe, pe_t = res
    dx = col_panel_spmm_raw(pe_t, g)
    zeros = lambda e: jax.tree.map(jnp.zeros_like, e)
    return zeros(pe), zeros(pe_t), dx


col_panel_spmm_pair.defvjp(_fwd, _bwd)
