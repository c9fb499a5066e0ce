"""GAT / GATv2 attention on the ColPanelELL layout — multi-million-row scale.

At products scale (>1M rows) the measured-best SpMM layout is ColPanelELL
(the ``Graph.from_coo`` auto-policy; PERF_NOTES r4: 560M edges/s fast-draw
at ogbn-products vs 45M for flat ELL), but attention previously had no
colpanel path: ``gat_conv_ell`` needs ``graph.ell`` + an EdgeMap, and its
slot gathers read the full ``[N, H·F']`` node table at the big-table gather
rate (~58M rows/s at 2.45M rows — exactly the wall the colpanel layout
exists to dodge). This module runs the same numerically-EXACT flash
one-pass (see :func:`pygcn_tpu.ops.gat.gat_conv_ell_onepass`) over the
column panels:

- sender-side gathers (source logits for v1, source features for both)
  read the MATERIALIZED per-panel slice — the small-table rate for ALL E
  edges, like the colpanel SpMM;
- only the per-virtual-row receiver operand (the receiver logit for v1,
  the ``[H·F']`` receiver transform for v2) rides a global gather, V ≈ E/k
  rows instead of E;
- per-panel-GROUP partial sets ``(num, den, max)`` flash-merge
  hierarchically (the blockwise-softmax merge is associative), so the live
  per-vrow partial buffers stay group-bounded the way the grouped GCN
  combine (``COLPANEL_GROUP_PANELS``) bounds the SpMM's.

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

from pygcn_tpu.ops.colpanel import (
    COLPANEL_GROUP_PANELS,
    MATERIALIZE_PANEL_SLICES,
    ColPanelELL,
)

# Per-bucket gathered-transient budget (elements of the widest [slots, H·F']
# tensor). Above it the bucket computes its per-vrow partials in row chunks
# under lax.map — same scheme as colpanel._flat_bucket_partial, sized half
# as large because attention keeps ~3 slot-wide tensors live (logits, exp
# weights, gathered features).
ATTN_CHUNK_BUDGET_ELEMS = 1 << 27

# Panels per flash-merge group. Smaller than the SpMM's COLPANEL_GROUP_PANELS
# (8): attention's group concats carry THREE [V_g, H·F] streams plus the
# rescale, and the products gat_step memory dump put the group buffers among
# the largest allocations. 2 quarters them at the cost of more
# [N, H·F] segment/merge passes (cheap next to the slot gathers).
ATTN_GROUP_PANELS = 2

# Gate each group's index arrays behind an optimization_barrier that also
# takes the running (num, den, m) accumulator, forcing XLA to SCHEDULE the
# groups sequentially. Without it the groups have no cross-dependencies
# until the final merge chain, and the memory scheduler overlaps every
# group's segment outputs and concat/partial buffers: the products gat_fwd
# program assigned 30-38 GB (> the v5e's 15.75 GB HBM) and failed to
# compile. (A zero-valued arithmetic token `x*0` does NOT work — the
# simplifier folds it and the dependency vanishes; the barrier is opaque.)
# Attention carries THREE per-vrow partial streams (num/den/max) where the
# GCN colpanel SpMM carries one — that is why the same grouped structure
# fits for SpMM but not here. The op is gather/bandwidth-bound, so the
# lost overlap is noise.
SERIALIZE_GROUPS = True


def check_gat_colpanel(graph) -> None:
    """Host-side guard for the vals!=0 validity inference (call once before
    jitting a colpanel attention step; mirrors ``build_gat_tiles_t``'s
    check for the hybrid path)."""
    import numpy as np

    if graph.colpanel is None:
        raise ValueError(
            "graph has no colpanel layout; build with build_colpanel=True"
        )
    w = np.asarray(graph.weights[: graph.n_edges])
    if w.size and not np.all(w != 0):
        raise ValueError(
            "colpanel attention requires all real edge weights to be "
            "nonzero (slot validity is inferred from vals != 0); found "
            f"{int((w == 0).sum())} zero-weight edges — use the edge_map "
            "(gat_conv_ell) path for graphs with explicit zero edges"
        )


def _flash_merge(num_a, den_a, m_a, num_b, den_b, m_b):
    """Exact merge of two per-receiver partial sets (associative; the local
    shifts cancel — same algebra as gat_conv_hybrid's tile+residual merge).
    ``m_*`` may be -inf where a receiver has no edge in that set
    (exp(-inf - finite_shift) = 0 cleanly zeroes its contribution)."""
    m = jax.lax.stop_gradient(jnp.maximum(m_a, m_b))
    shift = jnp.where(jnp.isfinite(m), m, 0.0)
    sa = jnp.exp(m_a - shift)
    sb = jnp.exp(m_b - shift)
    return num_a * sa + num_b * sb, den_a * sa + den_b * sb, m


def _chunk_map(body, cols, vals, rows, k: int, hf: int, budget: int):
    """Run ``body(cols_2d, vals_2d, rows_1d, chunk_idx) -> (num, den, bmax)``
    over row chunks of a flat bucket; returns [nb, hf] partials. Padded
    vrows (zero vals → all-invalid) are sliced away before the combine."""
    nb = cols.shape[0] // k
    if cols.shape[0] * hf <= budget:
        num, den, bmax = body(
            cols.reshape(nb, k), vals.reshape(nb, k), rows, jnp.int32(0)
        )
        return num, den, bmax
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
    num, den, bmax = jax.lax.map(
        lambda cvri: ck(*cvri), (cols_p, vals_p, rows_p, idx)
    )
    sl = lambda t: t.reshape(n_chunks * rpc, hf)[:nb]
    return sl(num), sl(den), sl(bmax)


def _panel_partials(pe: ColPanelELL, h: int, f: int, make_body):
    """Shared panel/group walk: ``make_body(panel_idx, start, width, fb)``
    returns the per-bucket chunk body for that panel. Produces the exact
    per-receiver ``(num, den, m)`` over the whole layout, each ``[N, H·F]``
    (``den``/``m`` f-replicated), merging one panel GROUP at a time."""
    hf = h * f
    n = pe.n_rows
    acc = None
    group = ATTN_GROUP_PANELS or max(1, len(pe.panels))
    for g0 in range(0, len(pe.panels), group):
        buckets = [
            (pi, bi, cols, vals, rows, k)
            for pi in range(g0, min(g0 + group, len(pe.panels)))
            for bi, (cols, vals, rows, k) in enumerate(
                zip(pe.panels[pi].cols, pe.panels[pi].vals,
                    pe.panels[pi].rows, pe.panels[pi].ks)
            )
        ]
        if SERIALIZE_GROUPS and acc is not None:
            nbk = len(buckets)
            gated = jax.lax.optimization_barrier(
                tuple(acc)
                + tuple(b[2] for b in buckets)  # cols
                + tuple(b[4] for b in buckets)  # rows
            )
            acc = gated[:3]
            buckets = [
                (pi, bi, gated[3 + i], vals, gated[3 + nbk + i], k)
                for i, (pi, bi, _, vals, _, k) in enumerate(buckets)
            ]
        num_parts, den_parts, max_parts, vrows = [], [], [], []
        bodies = {}
        for pi, bi, cols, vals, rows, k in buckets:
            if pi not in bodies:
                bodies[pi] = make_body(
                    pi, pe.starts[pi], pe.widths[pi], pe.panels[pi]
                )
            num, den, bmax = _chunk_map(
                bodies[pi](k, bi), cols, vals, rows, k, hf,
                ATTN_CHUNK_BUDGET_ELEMS,
            )
            num_parts.append(num)
            den_parts.append(den)
            max_parts.append(bmax)
            vrows.append(rows)
        r = jnp.concatenate(vrows, axis=0)
        bmax = jnp.concatenate(max_parts, axis=0)  # [V_g, H·F]
        m_g = jax.ops.segment_max(bmax, r, num_segments=n)
        shift = jax.lax.stop_gradient(jnp.where(jnp.isfinite(m_g), m_g, 0.0))
        scale = jnp.exp(bmax - jnp.take(shift, r, axis=0))
        num_g = jax.ops.segment_sum(
            jnp.concatenate(num_parts, axis=0) * scale, r, num_segments=n
        )
        den_g = jax.ops.segment_sum(
            jnp.concatenate(den_parts, axis=0) * scale, r, num_segments=n
        )
        acc = (
            (num_g, den_g, jax.lax.stop_gradient(m_g))
            if acc is None
            else _flash_merge(*acc, num_g, den_g, m_g)
        )
    if acc is None:  # every panel empty (degenerate layouts)
        z = jnp.zeros((n, hf))
        return z, z, jnp.full((n, hf), -jnp.inf)
    return acc


def _slice_table(x, s: int, w: int):
    xs = jax.lax.slice_in_dim(x, s, s + w)
    if MATERIALIZE_PANEL_SLICES:
        xs = jax.lax.optimization_barrier(xs)
    return xs


def gat_conv_colpanel(
    graph,
    s: jax.Array,  # [N, H, F'] per-head transformed features
    a_src: jax.Array,  # [H, F']
    a_dst: jax.Array,  # [H, F']
    negative_slope: float = 0.2,
    attn_dropout=None,  # optional (drop_fn((slot, idx), arr), key_slot) pair
) -> jax.Array:
    """Exact one-pass GAT convolution over ``graph.colpanel``. All per-slot
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
    logit_dst = rep(jnp.einsum("nhf,hf->nh", s, a_dst))
    s2 = s.reshape(n, hf)

    def make_body(pi, start, width, fb):
        # the source logit's panel slice is computed FROM the feature slice
        # (one tiny einsum per panel) instead of slicing a full [N, H·F]
        # f-replicated source-logit table: at products scale that table and
        # its broadcast/reshape copies cost ~2.4 GB of the HBM schedule.
        xg = _slice_table(s2, start, width)
        xl = rep(jnp.einsum("whf,hf->wh", xg.reshape(-1, h, f), a_src))

        def body_for(k, bi):
            def body(cols2, vals2, rows1, ci):
                nb = rows1.shape[0]
                valid = (vals2 != 0)[..., None]  # [nb, k, 1]
                flat = cols2.reshape(-1)
                lsrc = jnp.take(xl, flat, axis=0).reshape(nb, k, hf)
                ldst = jnp.take(logit_dst, rows1, axis=0)[:, None, :]
                e = jax.nn.leaky_relu(lsrc + ldst, negative_slope)
                e = jnp.where(valid, e, -jnp.inf)
                bmax = jax.lax.stop_gradient(e.max(axis=1))  # [nb, H·F]
                shift = jnp.where(jnp.isfinite(bmax), bmax, 0.0)
                ex = jnp.exp(e - shift[:, None, :])
                den = ex.sum(axis=1)
                if attn_dropout is not None:
                    drop, slot = attn_dropout
                    mask_in = jnp.ones((nb, k, h), ex.dtype)
                    # fold panel/bucket/chunk into one int32 key index
                    # (bucket ordinals < 2^5 per panel, chunks < 2^16)
                    ex = ex * rep(
                        drop((slot, (pi * (1 << 5) + bi) * (1 << 16) + ci),
                             mask_in)
                    )
                g = jnp.take(xg, flat, axis=0).reshape(nb, k, hf)
                return (g * ex).sum(axis=1), den, bmax

            return body

        return body_for

    num, den, _m = _panel_partials(pe, h, f, make_body)
    return (num / jnp.maximum(den, 1e-16)).reshape(n, h, f)


def gatv2_conv_colpanel(
    graph,
    s_l: jax.Array,  # [N, H, F'] source transform (x @ W_l)
    s_r: jax.Array,  # [N, H, F'] receiver transform (x @ W_r)
    a: jax.Array,  # [H, F']
    negative_slope: float = 0.2,
    attn_dropout=None,
) -> jax.Array:
    """Exact one-pass GATv2 over ``graph.colpanel``. The source transform is
    gathered ONCE per slot from the panel slice and feeds both the v2 logit
    (``a · leaky(s_l[u] + s_r[v])``, an F-reduction per slot) and the
    weighted aggregation — the same single-sweep structure as
    :func:`pygcn_tpu.ops.gat.gatv2_conv_ell_onepass`."""
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

    def make_body(pi, start, width, fb):
        xg = _slice_table(sl2, start, width)

        def body_for(k, bi):
            def body(cols2, vals2, rows1, ci):
                nb = rows1.shape[0]
                valid = (vals2 != 0)[..., None]  # [nb, k, 1]
                g = jnp.take(xg, cols2.reshape(-1), axis=0).reshape(
                    nb, k, h, f
                )
                d = jnp.take(sr2, rows1, axis=0).reshape(nb, 1, h, f)
                e = jnp.einsum(
                    "bkhf,hf->bkh",
                    jax.nn.leaky_relu(g + d, negative_slope), a,
                )
                e = jnp.where(valid, rep(e), -jnp.inf)  # [nb, k, H·F]
                bmax = jax.lax.stop_gradient(e.max(axis=1))
                shift = jnp.where(jnp.isfinite(bmax), bmax, 0.0)
                ex = jnp.exp(e - shift[:, None, :])
                den = ex.sum(axis=1)
                if attn_dropout is not None:
                    drop, slot = attn_dropout
                    mask_in = jnp.ones((nb, k, h), ex.dtype)
                    ex = ex * rep(
                        drop((slot, (pi * (1 << 5) + bi) * (1 << 16) + ci),
                             mask_in)
                    )
                return (g.reshape(nb, k, hf) * ex).sum(axis=1), den, bmax

            return body

        return body_for

    num, den, _m = _panel_partials(pe, h, f, make_body)
    return (num / jnp.maximum(den, 1e-16)).reshape(n, h, f)
