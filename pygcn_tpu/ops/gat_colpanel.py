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

# Pack the v1 per-panel source-logit table [w, H·F] (f-replicated per-head
# values — H real floats per row) as [ceil(w/F), F·H]: F consecutive panel
# rows per packed row, lane = (r % F)·H + head. Slot gathers read the SAME
# bytes per slot but from an F-times-smaller buffer — and the gather rate
# is set by the buffer the gather reads, not the index range (CLAUDE.md
# r3; materializing panel slices was 588 -> 370 ms at products for the
# same reason). The slot's per-head logits are recovered by masking the
# F-1 wrong lane groups to -inf and reducing — no per-slot dynamic
# slicing. Off by default until measured at products scale.
PACK_LOGIT_TABLES = False


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
    """Exact two-sweep edge softmax over the layout. Returns
    (num, den, m), each [N, H·F] (den/m f-replicated)."""
    if not pe.panels:  # every panel empty (degenerate layouts)
        z = jnp.zeros((n, hf), dtype)
        return z, z, jnp.full((n, hf), -jnp.inf, dtype)

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
    num, den = _walk(pe, (z, z), make_body_sum(m), sc_sum, group, serialize)
    return num, den, m


def _slice_table(x, s: int, w: int):
    xs = jax.lax.slice_in_dim(x, s, s + w)
    if MATERIALIZE_PANEL_SLICES:
        xs = jax.lax.optimization_barrier(xs)
    return xs


def _fold_key(pi: int, bi: int, ci):
    # fold panel/bucket/chunk into one int32 key index
    # (bucket ordinals < 2^5 per panel, chunks < 2^16)
    return (pi * (1 << 5) + bi) * (1 << 16) + ci


def _scan_chunks(body, carry, cols, vals, rows, k: int, hf: int, budget: int):
    """Backward-sweep chunking: ``body(carry, cols2, vals2, rows1) ->
    (carry, per_vrow_out)`` over row chunks of a flat bucket, THREADING a
    carry (the panel's [w, H·F] source-grad buffer + scalar-ish grads) so
    per-SLOT scatter contributions accumulate in place instead of
    materializing slot-wide outputs. Returns (carry, [nb, hf])."""
    nb = cols.shape[0] // k
    if cols.shape[0] * hf <= budget:
        return body(carry, cols.reshape(nb, k), vals.reshape(nb, k), rows)
    rpc = max(1, budget // (k * hf))
    n_chunks = -(-nb // rpc)
    pad = n_chunks * rpc - nb
    cols_p = jnp.pad(cols, (0, pad * k)).reshape(n_chunks, rpc, k)
    vals_p = jnp.pad(vals, (0, pad * k)).reshape(n_chunks, rpc, k)
    rows_p = jnp.pad(rows, (0, pad)).reshape(n_chunks, rpc)
    carry, outs = jax.lax.scan(
        lambda c, cvr: body(c, *cvr), carry, (cols_p, vals_p, rows_p)
    )
    # infer the per-vrow payload width: v1's dld rides head-compressed
    # [.., H] (f-replicated lanes carry no information; a full [N, H·F]
    # accumulator costs 16x at products scale), v2's dsr stays [.., H·F]
    return carry, outs.reshape(n_chunks * rpc, outs.shape[-1])[:nb]


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
    :class:`ColPanelELL` (probes pass the layout as a jit argument).

    Differentiation: without attention dropout, gradients flow through a
    HAND-WRITTEN VJP (:func:`_gat_v1_bwd`) — autodiff's per-use cotangent
    accumulation for the shared feature table assigns a full-size [N, H·F]
    pad/scatter buffer per panel slice and per receiver take (139.95 GB at
    products scale, PERF_NOTES r5); the manual backward re-derives alpha
    per bucket flash-style and accumulates source grads into panel-local
    [w, H·F] buffers followed by one contiguous slice-add each. With
    ``attn_dropout`` the autodiff path is used (training at that scale
    routes through the sampled paths)."""
    pe = graph if isinstance(graph, ColPanelELL) else graph.colpanel
    if pe is None:
        raise ValueError(
            "graph has no colpanel layout; build with build_colpanel=True"
        )
    group, ser = _resolve(group_panels, serialize, pe)
    if attn_dropout is None and pe.panels:
        return _gat_v1_pair(
            float(negative_slope), group, ser, pe, s, a_src, a_dst
        )
    out, _m, _den = _gat_v1_impl(
        pe, s, a_src, a_dst, negative_slope, attn_dropout, group, ser
    )
    return out


def _gat_v1_impl(pe, s, a_src, a_dst, negative_slope, attn_dropout,
                 group, ser):
    n, h, f = s.shape
    hf = h * f
    rep = lambda t: jnp.repeat(t, f, axis=-1)
    s2 = s.reshape(n, hf)

    packed = PACK_LOGIT_TABLES and f > 1

    def panel_tables(start, width):
        # the source logit's panel slice is computed FROM the feature slice
        # (one tiny einsum per panel) instead of slicing a full [N, H·F]
        # f-replicated source-logit table: at products scale that table and
        # its broadcast/reshape copies cost ~2.4 GB of the HBM schedule.
        xg = _slice_table(s2, start, width)
        xl_h = jnp.einsum("whf,hf->wh", xg.reshape(-1, h, f), a_src)
        if packed:
            w = xl_h.shape[0]
            npk = -(-w // f)
            xl = jnp.pad(xl_h, ((0, npk * f - w), (0, 0))).reshape(npk, hf)
        else:
            xl = rep(xl_h)
        return xg, xl

    def logits(xl, cols2, vals2, rows1):
        # the receiver logit is derived from the gathered s2 rows per chunk
        # (same gather bytes as a precomputed-table read, minus the 1.25 GB
        # [N, H·F] f-replicated logit_dst buffer at products scale)
        nb = rows1.shape[0]
        k = cols2.shape[1]
        valid = (vals2 != 0)[..., None]  # [nb, k, 1]
        flat = cols2.reshape(-1)
        srow = jnp.take(s2, rows1, axis=0).reshape(nb, h, f)
        ldst_h = jnp.einsum("bhf,hf->bh", srow, a_dst)
        if packed:
            # packed row u//f holds f slots' per-head logits; the slot's
            # group (u % f) is selected by masking the rest to -inf (a
            # reduce, not a per-slot dynamic slice)
            lp = jnp.take(xl, flat // f, axis=0).reshape(nb, k, hf)
            grp = (flat % f).reshape(nb, k)
            onehot = grp[..., None] == jnp.arange(f, dtype=grp.dtype)
            pre = lp + jnp.tile(ldst_h, (1, f))[:, None, :]
            e4 = jax.nn.leaky_relu(pre, negative_slope).reshape(nb, k, f, h)
            e_h = jnp.where(
                onehot[..., None] & valid[..., None], e4, -jnp.inf
            ).max(axis=2)  # [nb, k, h]
            return rep(e_h), flat
        lsrc = jnp.take(xl, flat, axis=0).reshape(nb, k, hf)
        ldst = rep(ldst_h)[:, None, :]
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

    num, den, m = _two_sweep(
        pe, n, hf, s.dtype, make_body_max, make_body_sum, group, ser
    )
    out = (num / jnp.maximum(den, 1e-16)).reshape(n, h, f)
    return out, m, den


def _gat_v1_fwd(negative_slope, group, ser, pe, s, a_src, a_dst):
    out, m, den = _gat_v1_impl(
        pe, s, a_src, a_dst, negative_slope, None, group, ser
    )
    # residuals are saved HEAD-compressed: m/den are exactly f-replicated
    # (every lane within a head carries the head value), so the [N, H·F]
    # tables cost F× their information — 1.17 GB each at products scale,
    # and the pair pushed the split backward 855 MB over the 15.75 GB chip
    n, h, f = s.shape
    m_h = m.reshape(n, h, f)[:, :, 0]
    den_h = den.reshape(n, h, f)[:, :, 0]
    return out, (pe, s, a_src, a_dst, m_h, den_h, out)


def _gat_v1_bwd(negative_slope, group, ser, res, dout):
    """Hand-written backward for the two-sweep colpanel GAT (third sweep).

    Per bucket, alpha is re-derived flash-style from the saved (m, den)
    and the standard softmax-attention gradient identities applied in
    f-replicated lane space::

        P  = dout / den                       (numerator path, per lane)
        S1 = sum_f g * P   (per head)         Q = sum_f dout*out/den
        de = ex * (S1 - Q)                    dpre = de * leaky'(pre)
        dxg[u] += ex*P (g path) + dpre * a_src        [slot -> panel buffer]
        dld[v] += sum_k dpre                          [vrow -> table]
        da_src += sum_slots dpre * g
        ds2    += per-panel slice-adds of dxg  +  dld * a_dst (receiver)
        da_dst  = sum_v dld * s2

    Source grads scatter into the panel's own [w, H·F] buffer (small-table
    rate) and land in ds2 via ONE contiguous slice-add per panel — the
    in-place chain autodiff could not produce (its per-use cotangents
    assigned 139.95 GB at products scale; PERF_NOTES r5)."""
    pe, s, a_src, a_dst, m_h, den_h, out = res  # m_h/den_h: [N, H]
    n, h, f = s.shape
    hf = h * f
    rep = lambda t: jnp.repeat(t, f, axis=-1)
    s2 = s.reshape(n, hf)
    out2 = out.reshape(n, hf)
    dout2 = dout.reshape(n, hf)
    # NO full-size [N, H·F] derived tables here: p (=dout/den) and q are
    # re-gathered per chunk from dout2 and the [N, H] residuals instead —
    # p_tab + q_tab + an f-replicated dld accumulator were 3× 1.17 GB of
    # coexisting HLO temps at products scale (split bwd measured 16.58 GB
    # vs the 15.75 GB chip; head-compressed it fits)
    deng_h = jnp.maximum(den_h, 1e-16)  # [N, h]
    q_head = (dout2 * out2).reshape(n, h, f).sum(axis=-1) / deng_h  # [N, h]
    asrc_flat = a_src.reshape(hf)
    adst_flat = a_dst.reshape(hf)

    ds2 = jnp.zeros((n, hf), s.dtype)
    dld_h = jnp.zeros((n, h), s.dtype)
    dasrc = jnp.zeros((1, hf), s.dtype)

    for g0 in range(0, len(pe.panels), group):
        buckets = [
            (pi, bi, cols, vals, rows, k)
            for pi in range(g0, min(g0 + group, len(pe.panels)))
            for bi, (cols, vals, rows, k) in enumerate(
                zip(pe.panels[pi].cols, pe.panels[pi].vals,
                    pe.panels[pi].rows, pe.panels[pi].ks)
            )
        ]
        if ser and g0 > 0:
            nbk = len(buckets)
            gated = jax.lax.optimization_barrier(
                (ds2, dld_h, dasrc)
                + tuple(b[2] for b in buckets)
                + tuple(b[3] for b in buckets)
                + tuple(b[4] for b in buckets)
            )
            ds2, dld_h, dasrc = gated[:3]
            buckets = [
                (pi, bi, gated[3 + i], gated[3 + nbk + i],
                 gated[3 + 2 * nbk + i], k)
                for i, (pi, bi, _, _, _, k) in enumerate(buckets)
            ]
        tables = {}
        dxgs = {}
        for pi, bi, cols, vals, rows, k in buckets:
            if pi not in tables:
                start, width = pe.starts[pi], pe.widths[pi]
                xg = _slice_table(s2, start, width)
                xl = rep(jnp.einsum("whf,hf->wh", xg.reshape(-1, h, f), a_src))
                tables[pi] = (xg, xl)
                dxgs[pi] = jnp.zeros((width, hf), s.dtype)
            xg, xl = tables[pi]

            def body(carry, cols2, vals2, rows1):
                dxg_c, dasrc_c = carry
                nb = rows1.shape[0]
                kk = cols2.shape[1]
                valid = (vals2 != 0)[..., None]  # [nb, k, 1]
                flat = cols2.reshape(-1)
                lsrc = jnp.take(xl, flat, axis=0).reshape(nb, kk, hf)
                srow = jnp.take(s2, rows1, axis=0).reshape(nb, h, f)
                ldst = rep(jnp.einsum("bhf,hf->bh", srow, a_dst))[:, None, :]
                pre = lsrc + ldst
                e = jnp.where(valid, jax.nn.leaky_relu(pre, negative_slope),
                              -jnp.inf)
                sh = jnp.take(m_h, rows1, axis=0)  # [nb, h]
                sh = rep(jnp.where(jnp.isfinite(sh), sh, 0.0))[:, None, :]
                ex = jnp.exp(e - sh)  # [nb, k, hf]
                g3 = jnp.take(xg, flat, axis=0).reshape(nb, kk, hf)
                den_r = rep(jnp.take(deng_h, rows1, axis=0))  # [nb, hf]
                pr = (jnp.take(dout2, rows1, axis=0) / den_r)[:, None, :]
                qr = rep(jnp.take(q_head, rows1, axis=0))[:, None, :]
                s1 = rep((g3 * pr).reshape(nb, kk, h, f).sum(axis=-1))
                de = ex * (s1 - qr)
                # >= 0 matches jax.nn.leaky_relu's autodiff convention at 0
                dpre = de * jnp.where(pre >= 0, 1.0, negative_slope)
                dpre = jnp.where(valid, dpre, 0.0)
                contrib = ex * pr + dpre * asrc_flat[None, None, :]
                dxg_c = dxg_c.at[flat].add(contrib.reshape(-1, hf))
                dasrc_c = dasrc_c + (dpre * g3).sum(axis=(0, 1))[None, :]
                # dpre is exactly f-replicated (every factor in de is) —
                # emit the head-compressed [nb, h] payload
                dld_b = dpre.sum(axis=1).reshape(nb, h, f)[:, :, 0]
                return (dxg_c, dasrc_c), dld_b  # [nb, h]

            (dxgs[pi], dasrc), dld_b = _scan_chunks(
                body, (dxgs[pi], dasrc), cols, vals, rows, k, hf,
                ATTN_CHUNK_BUDGET_ELEMS,
            )
            dld_h = dld_h.at[rows].add(dld_b)
        for pi, dxg in dxgs.items():
            start = pe.starts[pi]
            ds2 = ds2.at[start : start + pe.widths[pi]].add(dxg)

    # receiver-side closure: ld = einsum(s2_row, a_dst) replicated
    ds2 = ds2 + rep(dld_h) * adst_flat[None, :]
    dadst = jnp.einsum("nh,nhf->hf", dld_h, s)
    dasrc_hf = dasrc[0].reshape(h, f)
    zeros_pe = jax.tree.map(jnp.zeros_like, pe)
    return zeros_pe, ds2.reshape(n, h, f), dasrc_hf, dadst


def _gat_v1_raw(negative_slope, group, ser, pe, s, a_src, a_dst):
    out, _m, _den = _gat_v1_impl(
        pe, s, a_src, a_dst, negative_slope, None, group, ser
    )
    return out


_gat_v1_pair = jax.custom_vjp(_gat_v1_raw, nondiff_argnums=(0, 1, 2))
_gat_v1_pair.defvjp(_gat_v1_fwd, _gat_v1_bwd)


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
    gather where v1's sweep A reads only per-node logit scalars.

    Differentiation mirrors v1: without attention dropout gradients flow
    through a hand-written VJP (:func:`_gatv2_bwd`) — the autodiff step
    assigned 121.10 GB at products scale (PERF_NOTES r5) from the same
    per-use cotangent accumulation mechanism the v1 VJP removes."""
    pe = graph if isinstance(graph, ColPanelELL) else graph.colpanel
    if pe is None:
        raise ValueError(
            "graph has no colpanel layout; build with build_colpanel=True"
        )
    group, ser = _resolve(group_panels, serialize, pe)
    if attn_dropout is None and pe.panels:
        return _gatv2_pair(float(negative_slope), group, ser, pe, s_l, s_r, a)
    out, _m, _den = _gatv2_impl(
        pe, s_l, s_r, a, negative_slope, attn_dropout, group, ser
    )
    return out


def _gatv2_impl(pe, s_l, s_r, a, negative_slope, attn_dropout, group, ser):
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

    num, den, m = _two_sweep(
        pe, n, hf, s_l.dtype, make_body_max, make_body_sum, group, ser
    )
    out = (num / jnp.maximum(den, 1e-16)).reshape(n, h, f)
    return out, m, den


def _gatv2_fwd(negative_slope, group, ser, pe, s_l, s_r, a):
    out, m, den = _gatv2_impl(
        pe, s_l, s_r, a, negative_slope, None, group, ser
    )
    # head-compressed residuals (see _gat_v1_fwd): m/den are exactly
    # f-replicated; [N, H·F] copies cost 2.3 GB of args at products scale
    n, h, f = s_l.shape
    m_h = m.reshape(n, h, f)[:, :, 0]
    den_h = den.reshape(n, h, f)[:, :, 0]
    return out, (pe, s_l, s_r, a, m_h, den_h, out)


def _gatv2_bwd(negative_slope, group, ser, res, dout):
    """Hand-written backward for the two-sweep colpanel GATv2 (third sweep,
    the mechanical v2 transpose of :func:`_gat_v1_bwd`).

    v2's logit is ``e[u→v,h] = Σ_f a[h,f]·leaky(s_l[u]+s_r[v])[h,f]`` and
    its message is ``s_l[u]``, so alpha is re-derived per bucket from the
    saved (m, den) and the chain splits as::

        P  = dout / den                Q = Σ_f dout·out/den   (per head)
        de = ex · (Σ_f s_l[u]·P − Q)   (per-head scalar; lanes constant)
        dl = de · a                    dpre = dl · leaky'(pre)
        ds_l[u] += ex·P (message path) + dpre (logit path)   [panel buffer]
        ds_r[v] += Σ_k dpre                                   [vrow scatter]
        da      += Σ_slots de · leaky(pre)

    Source grads accumulate into panel-local [w, H·F] buffers followed by
    one contiguous slice-add each (the in-place chain autodiff could not
    produce: 121.10 GB assigned at products scale, PERF_NOTES r5)."""
    pe, s_l, s_r, a, m_h, den_h, out = res  # m_h/den_h: [N, H]
    n, h, f = s_l.shape
    hf = h * f
    rep = lambda t: jnp.repeat(t, f, axis=-1)
    sl2 = s_l.reshape(n, hf)
    sr2 = s_r.reshape(n, hf)
    out2 = out.reshape(n, hf)
    dout2 = dout.reshape(n, hf)
    # p/q re-gathered per chunk from dout2 + the [N, H] residuals — the
    # full [N, H·F] p_tab/q_tab pair was 2.3 GB of coexisting temps at
    # products scale (see _gat_v1_bwd)
    deng_h = jnp.maximum(den_h, 1e-16)  # [N, h]
    q_head = (dout2 * out2).reshape(n, h, f).sum(axis=-1) / deng_h  # [N, h]

    dsl = jnp.zeros((n, hf), s_l.dtype)
    dsr = jnp.zeros((n, hf), s_l.dtype)
    da = jnp.zeros((1, hf), s_l.dtype)

    for g0 in range(0, len(pe.panels), group):
        buckets = [
            (pi, bi, cols, vals, rows, k)
            for pi in range(g0, min(g0 + group, len(pe.panels)))
            for bi, (cols, vals, rows, k) in enumerate(
                zip(pe.panels[pi].cols, pe.panels[pi].vals,
                    pe.panels[pi].rows, pe.panels[pi].ks)
            )
        ]
        if ser and g0 > 0:
            nbk = len(buckets)
            gated = jax.lax.optimization_barrier(
                (dsl, dsr, da)
                + tuple(b[2] for b in buckets)
                + tuple(b[3] for b in buckets)
                + tuple(b[4] for b in buckets)
            )
            dsl, dsr, da = gated[:3]
            buckets = [
                (pi, bi, gated[3 + i], gated[3 + nbk + i],
                 gated[3 + 2 * nbk + i], k)
                for i, (pi, bi, _, _, _, k) in enumerate(buckets)
            ]
        tables = {}
        dxgs = {}
        for pi, bi, cols, vals, rows, k in buckets:
            if pi not in tables:
                start, width = pe.starts[pi], pe.widths[pi]
                tables[pi] = _slice_table(sl2, start, width)
                dxgs[pi] = jnp.zeros((width, hf), s_l.dtype)
            xg = tables[pi]

            def body(carry, cols2, vals2, rows1):
                dxg_c, da_c = carry
                nb = rows1.shape[0]
                kk = cols2.shape[1]
                valid = (vals2 != 0)[..., None]  # [nb, k, 1]
                flat = cols2.reshape(-1)
                g4 = jnp.take(xg, flat, axis=0).reshape(nb, kk, h, f)
                d4 = jnp.take(sr2, rows1, axis=0).reshape(nb, 1, h, f)
                pre = g4 + d4  # [nb, k, h, f]
                lk = jax.nn.leaky_relu(pre, negative_slope)
                e = jnp.where(
                    valid, rep(jnp.einsum("bkhf,hf->bkh", lk, a)), -jnp.inf
                )
                sh = jnp.take(m_h, rows1, axis=0)  # [nb, h]
                sh = rep(jnp.where(jnp.isfinite(sh), sh, 0.0))[:, None, :]
                ex = jnp.exp(e - sh)  # [nb, k, hf]
                g_hf = g4.reshape(nb, kk, hf)
                den_r = rep(jnp.take(deng_h, rows1, axis=0))  # [nb, hf]
                pr = (jnp.take(dout2, rows1, axis=0) / den_r)[:, None, :]
                qr = rep(jnp.take(q_head, rows1, axis=0))[:, None, :]
                s1 = rep((g_hf * pr).reshape(nb, kk, h, f).sum(axis=-1))
                de = ex * (s1 - qr)  # [nb, k, hf]; constant across f lanes
                de_h = de.reshape(nb, kk, h, f)[..., :1]  # [nb, k, h, 1]
                # >= 0 matches jax.nn.leaky_relu's autodiff convention at 0
                dpre = de_h * a[None, None] * jnp.where(
                    pre >= 0, 1.0, negative_slope)
                dpre = jnp.where(valid[..., None], dpre, 0.0)
                da_c = da_c + (de_h * lk).sum(axis=(0, 1)).reshape(1, hf)
                contrib = ex * pr + dpre.reshape(nb, kk, hf)
                dxg_c = dxg_c.at[flat].add(contrib.reshape(-1, hf))
                return (dxg_c, da_c), dpre.reshape(nb, kk, hf).sum(axis=1)

            (dxgs[pi], da), dsr_b = _scan_chunks(
                body, (dxgs[pi], da), cols, vals, rows, k, hf,
                ATTN_CHUNK_BUDGET_ELEMS,
            )
            dsr = dsr.at[rows].add(dsr_b)
        for pi, dxg in dxgs.items():
            start = pe.starts[pi]
            dsl = dsl.at[start : start + pe.widths[pi]].add(dxg)

    da_hf = da[0].reshape(h, f)
    zeros_pe = jax.tree.map(jnp.zeros_like, pe)
    return (zeros_pe, dsl.reshape(n, h, f), dsr.reshape(n, h, f), da_hf)


def _gatv2_raw(negative_slope, group, ser, pe, s_l, s_r, a):
    out, _m, _den = _gatv2_impl(
        pe, s_l, s_r, a, negative_slope, None, group, ser
    )
    return out


_gatv2_pair = jax.custom_vjp(_gatv2_raw, nondiff_argnums=(0, 1, 2))
_gatv2_pair.defvjp(_gatv2_fwd, _gatv2_bwd)


def split_attention_step(
    negative_slope: float = 0.2,
    group_panels: int | None = None,
    serialize: bool | None = None,
    v2: bool = False,
):
    """Return ``(fwd, bwd)`` for a TWO-PROGRAM attention train step.

    At products scale the ONE-program step cannot fit the v5e's 15.75 GB
    HBM: the forward alone assigns 12.58 GB and the backward adds three
    more ``[N, H·F']`` tables (16.25 GB measured at chunk budget 1<<25;
    14.8 + 2.1 GB AOT at 1<<24). Compiling the custom-VJP halves as two
    separate jitted programs — residuals staying device-resident between
    them — fits each half with headroom. This is the production step
    structure for >1M-node full-batch attention, not a timing trick
    (PERF_NOTES r3 compile-splitting lesson promoted to API).

    - v1: ``fwd(pe, s, a_src, a_dst) -> (out, aux)``;
      ``bwd(pe, s, a_src, a_dst, out, aux, dout) -> (ds, da_src, da_dst)``.
    - v2 (``v2=True``): ``fwd(pe, s_l, s_r, a) -> (out, aux)``;
      ``bwd(pe, s_l, s_r, a, out, aux, dout) -> (ds_l, ds_r, da)``.

    Two contract changes vs the one-program custom VJP, both load-bearing
    for the HBM schedule:

    - ``aux`` carries ONLY the computed residuals ``(m, den)``. Routing
      the INPUTS through the forward's outputs (the custom-VJP residual
      convention) forces un-aliased output copies of the layout and
      feature table — +2 GB at products scale; the first split fwd
      compiled at 16.08 GB because of exactly this. The caller re-passes
      its own device-resident inputs to ``bwd`` instead.
    - ``bwd`` drops the layout cotangent (a ~1 GB zeros pytree) so XLA
      dead-code-eliminates those buffers from the backward program.

    Wrap each in ``jax.jit`` at the call site (the returned functions are
    pure). ``group_panels``/``serialize`` default like the convs.
    """
    ns = float(negative_slope)

    def resolve(pe):
        return _resolve(group_panels, serialize, pe)

    if v2:
        def fwd(pe, s_l, s_r, a):
            g, ser = resolve(pe)
            out, res = _gatv2_fwd(ns, g, ser, pe, s_l, s_r, a)
            return out, (res[4], res[5])

        def bwd(pe, s_l, s_r, a, out, aux, dout):
            g, ser = resolve(pe)
            res = (pe, s_l, s_r, a, aux[0], aux[1], out)
            return _gatv2_bwd(ns, g, ser, res, dout)[1:]
    else:
        def fwd(pe, s, a_src, a_dst):
            g, ser = resolve(pe)
            out, res = _gat_v1_fwd(ns, g, ser, pe, s, a_src, a_dst)
            return out, (res[4], res[5])

        def bwd(pe, s, a_src, a_dst, out, aux, dout):
            g, ser = resolve(pe)
            res = (pe, s, a_src, a_dst, aux[0], aux[1], out)
            return _gat_v1_bwd(ns, g, ser, res, dout)[1:]

    return fwd, bwd
