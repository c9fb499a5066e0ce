"""GAT / GATv2 attention on the ColPanelELL layout — multi-million-row scale.

At products scale (>1M rows) the measured-best SpMM layout is ColPanelELL
(the ``Graph.from_coo`` auto-policy; PERF_NOTES r4: 560M edges/s fast-draw
at ogbn-products vs 45M for flat ELL), but attention previously had no
colpanel path: ``gat_conv_ell`` needs ``graph.ell`` + an EdgeMap, and its
slot gathers read the full ``[N, H·F']`` node table at the big-table gather
rate (~58M rows/s at 2.45M rows — exactly the wall the colpanel layout
exists to dodge).

This module computes the numerically-EXACT edge softmax in **two sweeps**
over the column panels (replacing the round-4 one-pass flash-merge design,
whose per-group ``(num, den, max)`` accumulator chain put the products
forward 1.1 GB over the v5e's 15.75 GB HBM and — because every merge-chain
accumulator becomes an autodiff residual — the train step 107 GB over):

- **Sweep A (max)**: per-receiver global logit max ``m``, accumulated one
  panel group at a time into a single ``[N, H·F']`` running-max buffer.
  The exact-softmax shift is a *constant* (shifts cancel in ``num/den``),
  so the whole sweep runs under ``stop_gradient`` — the backward never
  touches it and it carries zero residuals.
- **Sweep B (sums)**: with ``m`` known, every bucket's contribution is
  final — ``num += segment_sum(g·exp(e−m_v))``, ``den += segment_sum(
  exp(e−m_v))``. The cross-group combine is *linear* (plain adds), so
  autodiff saves nothing per group; per-bucket transients are rematerialized
  by the chunk-level ``jax.checkpoint`` (the flash memory/FLOP trade).

Cost vs the one-pass: sweep A re-reads the logit operands (one extra
gather stream ≈ +50 % slot traffic for v1, a second feature gather for
v2); in exchange the live set is input tables + three ``[N, H·F']``
accumulators + one group's transients, for forward AND backward. A 1.5×-
traffic op that fits beats a 1×-traffic op that OOMs.

Sender-side gathers read the MATERIALIZED per-panel slice — the
small-table rate for ALL E edges, like the colpanel SpMM; only per-vrow
receiver operands ride a global gather (V ≈ E/k rows instead of E).

Slot validity is inferred from stored ``vals != 0`` (the flat layout keeps
no structural mask) — the same contract as ``gat_conv_hybrid``'s residual;
:func:`check_gat_colpanel` is the host-side guard that turns the
assumption into an error instead of a silent divergence. Attention ignores
the stored edge WEIGHTS themselves (attention coefficients replace them),
matching every other GAT path.

Reference analog: attention is an extension family (the reference's only
attention is the pooled-key node scorer, ``pygcn/models.py:316-329``); the
sparse-engine contract this extends is ``torch.spmm``
(reference ``pygcn/layers.py:34``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pygcn_tpu.ops.colpanel import MATERIALIZE_PANEL_SLICES, ColPanelELL

# Per-bucket gathered-transient budget (elements of the widest [slots, H·F']
# tensor). Above it the bucket computes its per-vrow parts in row chunks
# under lax.map — same scheme as colpanel._flat_bucket_partial, sized an
# eighth as large because attention keeps ~3 slot-wide tensors live
# (logits, exp weights, gathered features) and the products schedule needs
# every transient bounded (the 1<<26 schedule compiled at 15.32 GB and
# still ResourceExhausted'd at RUNTIME on the 15.75 GB chip).
ATTN_CHUNK_BUDGET_ELEMS = 1 << 25

# Panels per combine group (default for the ``group_panels`` argument).
# Each group concatenates its buckets' per-vrow parts ([V_g, H·F] streams)
# before one segment op; larger groups amortize segment passes, smaller
# groups shrink the concat transients. 2 fits the products HBM schedule
# with room (measured r5).
ATTN_GROUP_PANELS = 2

# Gate each group's index arrays behind an optimization_barrier that also
# takes the running accumulator(s), forcing XLA to SCHEDULE the groups
# sequentially. Without it the groups have no cross-dependencies until the
# final combine, and the memory scheduler overlaps every group's segment
# outputs and concat buffers (the r4 one-pass products forward assigned
# 30-38 GB this way). (A zero-valued arithmetic token `x*0` does NOT work —
# the simplifier folds it and the dependency vanishes; the barrier is
# opaque.) The barrier's transpose is a barrier over the cotangents, so the
# BACKWARD group chain serializes the same way. The op is gather/bandwidth-
# bound, so the lost overlap is noise.
SERIALIZE_GROUPS = True


def check_gat_colpanel(graph, senders=None, receivers=None, weights=None) -> None:
    """Host-side guard for the ``vals != 0`` validity inference (call once
    before jitting a colpanel attention step; mirrors ``build_gat_tiles_t``'s
    check for the hybrid path).

    Pass host-side ``senders``/``receivers``/``weights`` arrays when the
    graph is already device_put — on the axon tunnel, pulling the device
    edge arrays back costs ~6 s at products scale (CLAUDE.md).

    Checks BOTH failure modes of the inference:

    - an explicit zero-weight edge (its slot looks invalid → silently
      dropped from attention);
    - duplicate COO edges: ``build_col_panel_ell`` goes through
      ``coo.tocsc()``, which SUMS duplicates — a duplicate pair attends
      once here vs twice on the COO/edge-softmax path, and a cancelled pair
      (weights summing to zero) is dropped entirely.
    """
    import numpy as np
    import scipy.sparse as sp

    if graph.colpanel is None:
        raise ValueError(
            "graph has no colpanel layout; build with build_colpanel=True"
        )
    ne = graph.n_edges
    if weights is None:
        weights = np.asarray(graph.weights)
    if senders is None:
        senders = np.asarray(graph.senders)
    if receivers is None:
        receivers = np.asarray(graph.receivers)
    w = np.asarray(weights)[:ne]
    if w.size and not np.all(w != 0):
        raise ValueError(
            "colpanel attention requires all real edge weights to be "
            "nonzero (slot validity is inferred from vals != 0); found "
            f"{int((w == 0).sum())} zero-weight edges — use the edge_map "
            "(gat_conv_ell) path for graphs with explicit zero edges"
        )
    # dedup-aware check: rebuild the matrix the same way the layout builder
    # does (tocsc coalesces duplicates)
    m = sp.coo_matrix(
        (w, (np.asarray(receivers)[:ne], np.asarray(senders)[:ne])),
        shape=(graph.n_nodes, graph.n_nodes),
    ).tocsc()
    if m.nnz != ne or (m.nnz and not np.all(m.data != 0)):
        raise ValueError(
            f"colpanel attention requires duplicate-free edges: {ne} COO "
            f"edges coalesce to {m.nnz} stored entries "
            f"({int((m.data == 0).sum())} summing to zero) — duplicates "
            "attend once (or never, if cancelled) on this layout vs once "
            "per copy on the COO path; deduplicate the edge list first"
        )


def _chunk_map(body, cols, vals, rows, k: int, hf: int, budget: int):
    """Run ``body(cols_2d, vals_2d, rows_1d, chunk_idx) -> tuple of
    [nb(, hf)]`` over row chunks of a flat bucket; returns the same tuple
    with full-bucket leading dims. Padded vrows (zero vals → all-invalid)
    are sliced away before the combine."""
    nb = cols.shape[0] // k
    if cols.shape[0] * hf <= budget:
        # checkpoint SMALL buckets too: without it autodiff saves their
        # [nb, k, H·F] exp/gather intermediates, and across the many
        # sub-budget buckets of a products layout those residuals alone
        # were ~100 GB of the (failed) backward schedule
        return jax.checkpoint(body)(
            cols.reshape(nb, k), vals.reshape(nb, k), rows, jnp.int32(0))
    rpc = max(1, budget // (k * hf))
    n_chunks = -(-nb // rpc)
    pad = n_chunks * rpc - nb
    cols_p = jnp.pad(cols, (0, pad * k)).reshape(n_chunks, rpc, k)
    vals_p = jnp.pad(vals, (0, pad * k)).reshape(n_chunks, rpc, k)
    rows_p = jnp.pad(rows, (0, pad)).reshape(n_chunks, rpc)
    idx = jnp.arange(n_chunks, dtype=jnp.int32)
    # remat each chunk: without it autodiff saves every chunk's [rpc, k, H·F]
    # exp/gather residuals — ~E·H·F floats (tens of GB at products scale).
    # Recomputing from the (already-live) node tables is the flash-attention
    # memory/FLOP trade.
    ck = jax.checkpoint(body)
    out = jax.lax.map(lambda cvri: ck(*cvri), (cols_p, vals_p, rows_p, idx))
    sl = lambda t: t.reshape((n_chunks * rpc,) + t.shape[2:])[:nb]
    return jax.tree.map(sl, out)


def _walk(pe: ColPanelELL, accs, make_body, scatter, group: int, serialize: bool):
    """Shared panel/group sweep. ``make_body(panel_idx, start, width)``
    returns the per-bucket chunk-body factory for that panel;
    ``scatter(accs, parts, rows)`` folds ONE BUCKET's per-vrow part streams
    into the running accumulators — an in-place ``acc.at[rows].add/max``
    scatter, NOT a per-group segment op: the scatter chain updates the
    accumulator buffers in place (like a dynamic_update_slice chain), where
    a per-group ``segment_sum`` materialized two extra [N, H·F] outputs per
    group (~2.5 GB at products scale) before the add. Groups are
    (optionally) serialized via an opaque barrier on the accumulators +
    this group's index arrays (see SERIALIZE_GROUPS)."""
    hf = accs[0].shape[-1]
    for g0 in range(0, len(pe.panels), group):
        buckets = [
            (pi, bi, cols, vals, rows, k)
            for pi in range(g0, min(g0 + group, len(pe.panels)))
            for bi, (cols, vals, rows, k) in enumerate(
                zip(pe.panels[pi].cols, pe.panels[pi].vals,
                    pe.panels[pi].rows, pe.panels[pi].ks)
            )
        ]
        if serialize and g0 > 0:
            # gate this group's index AND value arrays behind a barrier that
            # routes the running accumulators: delays the group's
            # (hoistable, argument-only) relayout copies — cols2/vals2
            # [nb, k] tiles are 32x-padded at k=4 — until the previous
            # groups' scatters have run. A lighter token-only variant (a
            # 1-element accumulator slice through the barrier, accs passed
            # around it) MEASURED WORSE: 16.01 GB vs 15.37 — without the
            # accumulator routed through, each group's panel tables and
            # gather streams overlap the next group's.
            nbk = len(buckets)
            na = len(accs)
            gated = jax.lax.optimization_barrier(
                tuple(accs)
                + tuple(b[2] for b in buckets)  # cols
                + tuple(b[3] for b in buckets)  # vals
                + tuple(b[4] for b in buckets)  # rows
            )
            accs = gated[:na]
            buckets = [
                (pi, bi, gated[na + i], gated[na + nbk + i],
                 gated[na + 2 * nbk + i], k)
                for i, (pi, bi, _, _, _, k) in enumerate(buckets)
            ]
        bodies = {}
        for pi, bi, cols, vals, rows, k in buckets:
            if pi not in bodies:
                bodies[pi] = make_body(pi, pe.starts[pi], pe.widths[pi])
            parts = _chunk_map(
                bodies[pi](k, bi), cols, vals, rows, k, hf,
                ATTN_CHUNK_BUDGET_ELEMS,
            )
            accs = scatter(accs, parts, rows)
    return accs


def _resolve(group_panels, serialize, pe):
    g = ATTN_GROUP_PANELS if group_panels is None else group_panels
    g = g or max(1, len(pe.panels))
    s = SERIALIZE_GROUPS if serialize is None else serialize
    return g, s


def _two_sweep(pe, n, hf, dtype, make_body_max, make_body_sum, group, serialize):
    """Exact two-sweep edge softmax over the layout. Returns (num, den),
    each [N, H·F] (den f-replicated)."""
    if not pe.panels:  # every panel empty (degenerate layouts)
        return jnp.zeros((n, hf), dtype), jnp.zeros((n, hf), dtype)

    # Sweep A: global per-receiver max. Exact-softmax shifts cancel, so the
    # sweep is gradient-free by construction. Scatter-max handles duplicate
    # vrow ids (a row split across panels) like segment_max would.
    def sc_max(accs, parts, rows):
        (bmax,) = parts
        return (accs[0].at[rows].max(bmax),)

    (m,) = _walk(
        pe, (jnp.full((n, hf), -jnp.inf, dtype),), make_body_max, sc_max,
        group, serialize,
    )
    # rows with no edges keep m = -inf; chunk bodies guard the taken shift
    # with isfinite (exp(-inf - 0) = 0), so no full-table `where` buffer is
    # ever materialized
    m = jax.lax.stop_gradient(m)

    # Sweep B: final num/den accumulation — the scatter-add chain is
    # linear, so the backward re-derives per-bucket terms via the chunk
    # remat and carries no per-group residuals (scatter-add's transpose is
    # a gather from the cotangent).
    def sc_sum(accs, parts, rows):
        num_p, den_p = parts
        return accs[0].at[rows].add(num_p), accs[1].at[rows].add(den_p)

    z = jnp.zeros((n, hf), dtype)
    return _walk(pe, (z, z), make_body_sum(m), sc_sum, group, serialize)


def _slice_table(x, s: int, w: int):
    xs = jax.lax.slice_in_dim(x, s, s + w)
    if MATERIALIZE_PANEL_SLICES:
        xs = jax.lax.optimization_barrier(xs)
    return xs


def _fold_key(pi: int, bi: int, ci):
    # fold panel/bucket/chunk into one int32 key index
    # (bucket ordinals < 2^5 per panel, chunks < 2^16)
    return (pi * (1 << 5) + bi) * (1 << 16) + ci


def gat_conv_colpanel(
    graph,
    s: jax.Array,  # [N, H, F'] per-head transformed features
    a_src: jax.Array,  # [H, F']
    a_dst: jax.Array,  # [H, F']
    negative_slope: float = 0.2,
    attn_dropout=None,  # optional (drop_fn((slot, idx), arr), key_slot) pair
    group_panels: int | None = None,  # panels per combine group (None = default)
    serialize: bool | None = None,  # serialize group schedule (None = default)
) -> jax.Array:
    """Exact two-sweep GAT convolution over ``graph.colpanel``. All per-slot
    algebra rides f-replicated ``[.., H·F]`` lanes (the narrow-lane padding
    lesson from ``gat_conv_ell_onepass``). ``graph`` may be a bare
    :class:`ColPanelELL` (probes pass the layout as a jit argument)."""
    pe = graph if isinstance(graph, ColPanelELL) else graph.colpanel
    if pe is None:
        raise ValueError(
            "graph has no colpanel layout; build with build_colpanel=True"
        )
    n, h, f = s.shape
    hf = h * f
    rep = lambda t: jnp.repeat(t, f, axis=-1)
    s2 = s.reshape(n, hf)

    def panel_tables(start, width):
        # the source logit's panel slice is computed FROM the feature slice
        # (one tiny einsum per panel) instead of slicing a full [N, H·F]
        # f-replicated source-logit table: at products scale that table and
        # its broadcast/reshape copies cost ~2.4 GB of the HBM schedule.
        xg = _slice_table(s2, start, width)
        xl = rep(jnp.einsum("whf,hf->wh", xg.reshape(-1, h, f), a_src))
        return xg, xl

    def logits(xl, cols2, vals2, rows1):
        # the receiver logit is derived from the gathered s2 rows per chunk
        # (same gather bytes as a precomputed-table read, minus the 1.25 GB
        # [N, H·F] f-replicated logit_dst buffer at products scale)
        nb = rows1.shape[0]
        k = cols2.shape[1]
        valid = (vals2 != 0)[..., None]  # [nb, k, 1]
        flat = cols2.reshape(-1)
        lsrc = jnp.take(xl, flat, axis=0).reshape(nb, k, hf)
        srow = jnp.take(s2, rows1, axis=0).reshape(nb, h, f)
        ldst = rep(jnp.einsum("bhf,hf->bh", srow, a_dst))[:, None, :]
        e = jax.nn.leaky_relu(lsrc + ldst, negative_slope)
        return jnp.where(valid, e, -jnp.inf), flat

    def make_body_max(pi, start, width):
        _, xl = panel_tables(start, width)

        def body_for(k, bi):
            def body(cols2, vals2, rows1, ci):
                e, _ = logits(xl, cols2, vals2, rows1)
                return (jax.lax.stop_gradient(e.max(axis=1)),)

            return body

        return body_for

    def make_body_sum(m):
        def make_body(pi, start, width):
            xg, xl = panel_tables(start, width)

            def body_for(k, bi):
                def body(cols2, vals2, rows1, ci):
                    nb = rows1.shape[0]
                    e, flat = logits(xl, cols2, vals2, rows1)
                    sh = jnp.take(m, rows1, axis=0)
                    sh = jnp.where(jnp.isfinite(sh), sh, 0.0)[:, None, :]
                    ex = jnp.exp(e - sh)  # [nb, k, H·F]
                    den = ex.sum(axis=1)
                    if attn_dropout is not None:
                        drop, slot = attn_dropout
                        mask_in = jnp.ones((nb, k, h), ex.dtype)
                        ex = ex * rep(drop((slot, _fold_key(pi, bi, ci)), mask_in))
                    g = jnp.take(xg, flat, axis=0).reshape(nb, k, hf)
                    return (g * ex).sum(axis=1), den

                return body

            return body_for

        return make_body

    group, ser = _resolve(group_panels, serialize, pe)
    num, den = _two_sweep(
        pe, n, hf, s.dtype, make_body_max, make_body_sum, group, ser
    )
    return (num / jnp.maximum(den, 1e-16)).reshape(n, h, f)


def gatv2_conv_colpanel(
    graph,
    s_l: jax.Array,  # [N, H, F'] source transform (x @ W_l)
    s_r: jax.Array,  # [N, H, F'] receiver transform (x @ W_r)
    a: jax.Array,  # [H, F']
    negative_slope: float = 0.2,
    attn_dropout=None,
    group_panels: int | None = None,
    serialize: bool | None = None,
) -> jax.Array:
    """Exact two-sweep GATv2 over ``graph.colpanel``. The v2 logit
    (``a · leaky(s_l[u] + s_r[v])``, an F-reduction per slot) needs the
    gathered source features in BOTH sweeps, so v2 pays a second feature
    gather where v1's sweep A reads only per-node logit scalars."""
    pe = graph if isinstance(graph, ColPanelELL) else graph.colpanel
    if pe is None:
        raise ValueError(
            "graph has no colpanel layout; build with build_colpanel=True"
        )
    n, h, f = s_l.shape
    hf = h * f
    rep = lambda t: jnp.repeat(t, f, axis=-1)
    sl2 = s_l.reshape(n, hf)
    sr2 = s_r.reshape(n, hf)

    def gather_logits(xg, cols2, vals2, rows1):
        nb = rows1.shape[0]
        k = cols2.shape[1]
        valid = (vals2 != 0)[..., None]  # [nb, k, 1]
        g = jnp.take(xg, cols2.reshape(-1), axis=0).reshape(nb, k, h, f)
        d = jnp.take(sr2, rows1, axis=0).reshape(nb, 1, h, f)
        e = jnp.einsum(
            "bkhf,hf->bkh", jax.nn.leaky_relu(g + d, negative_slope), a
        )
        return jnp.where(valid, rep(e), -jnp.inf), g

    def make_body_max(pi, start, width):
        xg = _slice_table(sl2, start, width)

        def body_for(k, bi):
            def body(cols2, vals2, rows1, ci):
                e, _ = gather_logits(xg, cols2, vals2, rows1)
                return (jax.lax.stop_gradient(e.max(axis=1)),)

            return body

        return body_for

    def make_body_sum(m):
        def make_body(pi, start, width):
            xg = _slice_table(sl2, start, width)

            def body_for(k, bi):
                def body(cols2, vals2, rows1, ci):
                    nb = rows1.shape[0]
                    e, g = gather_logits(xg, cols2, vals2, rows1)
                    sh = jnp.take(m, rows1, axis=0)
                    sh = jnp.where(jnp.isfinite(sh), sh, 0.0)[:, None, :]
                    ex = jnp.exp(e - sh)
                    den = ex.sum(axis=1)
                    if attn_dropout is not None:
                        drop, slot = attn_dropout
                        mask_in = jnp.ones((nb, k, h), ex.dtype)
                        ex = ex * rep(drop((slot, _fold_key(pi, bi, ci)), mask_in))
                    return (g.reshape(nb, k, hf) * ex).sum(axis=1), den

                return body

            return body_for

        return make_body

    group, ser = _resolve(group_panels, serialize, pe)
    num, den = _two_sweep(
        pe, n, hf, s_l.dtype, make_body_max, make_body_sum, group, ser
    )
    return (num / jnp.maximum(den, 1e-16)).reshape(n, h, f)
