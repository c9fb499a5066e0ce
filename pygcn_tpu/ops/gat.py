"""Graph attention (GAT) ops: edge softmax + dynamic-weight aggregation.

Beyond the reference's model zoo (its only attention is the pooled-key node
scorer, ``pygcn/models.py:316-329``); this exercises the sparse engine with
**edge weights that change every step** — attention logits are recomputed
from activations, so no precomputed layout values apply. TPU-first shape:

- GATv1 logits decompose per edge (u → v) as
  ``leaky_relu(a_src · s_u + a_dst · s_v)`` where ``s = x @ W`` — two scalar
  gathers per edge instead of materializing the concatenated pair;
- the per-receiver softmax is a segment max / exp / segment sum over the
  Graph container's receiver-sorted COO arrays (static shapes, no scatter
  beyond XLA's segment combiner);
- aggregation is the COO segment SpMM with the attention values riding in
  place of stored edge weights.

Everything supports a trailing head axis ``[E_pad, H]`` (multi-head GAT
folds heads into the feature dim, one pass for all heads).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pygcn_tpu.graph.graph import Graph


def _edge_valid(graph: Graph) -> jax.Array:
    """[E_pad] {0,1}: padding edges (beyond n_edges) must not attend."""
    return (jnp.arange(graph.e_pad) < graph.n_edges).astype(jnp.float32)


def edge_softmax(graph: Graph, logits: jax.Array) -> jax.Array:
    """Softmax of edge logits over each receiver's incoming edges.

    ``logits``: [E_pad] or [E_pad, H] → same shape; padded edges get 0.
    Numerically stable (per-receiver max subtraction); isolated receivers
    produce no terms and simply keep zero rows downstream.
    """
    valid = _edge_valid(graph)
    vshape = valid.reshape((-1,) + (1,) * (logits.ndim - 1))
    neg = jnp.where(vshape > 0, logits, -jnp.inf)
    # receivers are sorted by Graph construction: the flag is a measured
    # ~1.8x on TPU segment ops at this scale
    m = jax.ops.segment_max(
        neg, graph.receivers, num_segments=graph.n_nodes, indices_are_sorted=True
    )
    m = jnp.where(jnp.isfinite(m), m, 0.0)  # receivers with no edges
    ex = jnp.exp(neg - jnp.take(m, graph.receivers, axis=0)) * vshape
    denom = jax.ops.segment_sum(
        ex, graph.receivers, num_segments=graph.n_nodes, indices_are_sorted=True
    )
    denom = jnp.take(denom, graph.receivers, axis=0)
    return ex / jnp.maximum(denom, 1e-16)


def attention_aggregate(graph: Graph, s: jax.Array, alpha: jax.Array) -> jax.Array:
    """``out_v = Σ_{u→v} alpha_uv * s_u`` — COO SpMM with dynamic values.

    ``s``: [N, ...feat]; ``alpha``: [E_pad] or [E_pad, H] broadcastable
    against the gathered ``s[senders]``. Gather and scatter run on a
    FLATTENED feature axis — 3-D segment operands measured 6-7x slower on
    TPU than the same bytes flat ([E, 8, 8] 317 ms vs [E, 64] ~50 ms at
    arxiv scale).
    """
    feat_shape = s.shape[1:]
    gathered = jnp.take(s.reshape(s.shape[0], -1), graph.senders, axis=0)
    if alpha.ndim == 1:
        weighted = gathered * alpha[:, None]
    else:
        # per-head alpha [E, H] against [E, H, F] features, flat in/out
        e = gathered.shape[0]
        weighted = (
            gathered.reshape((e,) + feat_shape) * alpha[..., None]
        ).reshape(e, -1)
    out = jax.ops.segment_sum(
        weighted, graph.receivers, num_segments=graph.n_nodes,
        indices_are_sorted=True,
    )
    return out.reshape((graph.n_nodes,) + feat_shape)


def gat_attention(
    graph: Graph,
    s: jax.Array,  # [N, H, F'] per-head transformed features
    a_src: jax.Array,  # [H, F']
    a_dst: jax.Array,  # [H, F']
    negative_slope: float = 0.2,
) -> jax.Array:
    """Per-edge, per-head attention weights ``alpha`` [E_pad, H]."""
    logit_src = jnp.einsum("nhf,hf->nh", s, a_src)
    logit_dst = jnp.einsum("nhf,hf->nh", s, a_dst)
    e = jnp.take(logit_src, graph.senders, axis=0) + jnp.take(
        logit_dst, graph.receivers, axis=0
    )
    return edge_softmax(graph, jax.nn.leaky_relu(e, negative_slope))


def gatv2_attention(
    graph: Graph,
    s_l: jax.Array,  # [N, H, F'] source transform (x @ W_l)
    s_r: jax.Array,  # [N, H, F'] receiver transform (x @ W_r)
    a: jax.Array,  # [H, F']
    negative_slope: float = 0.2,
) -> jax.Array:
    """Per-edge, per-head GATv2 attention weights ``alpha`` [E_pad, H].

    GATv2 (Brody et al. 2022) applies the nonlinearity BEFORE the attention
    vector — ``e_uv = a · leaky_relu(s_l[u] + s_r[v])`` — making attention
    *dynamic* (the ranking of neighbors can depend on the receiver). Unlike
    v1 this cannot decompose into two scalar gathers; the per-edge [E, H·F']
    intermediate is materialized flat (the TPU-friendly shape) and reduced
    against ``a`` immediately.
    """
    n, h, f = s_l.shape
    g = jnp.take(s_l.reshape(n, h * f), graph.senders, axis=0)
    d = jnp.take(s_r.reshape(n, h * f), graph.receivers, axis=0)
    e = jax.nn.leaky_relu(g + d, negative_slope).reshape(-1, h, f)
    logits = jnp.einsum("ehf,hf->eh", e, a)
    return edge_softmax(graph, logits)


# ---------------------------------------------------------------------- #
# Fused bucketed-ELL GAT: all per-receiver reductions ride virtual rows
# ---------------------------------------------------------------------- #


@dataclasses.dataclass(frozen=True)
class EdgeMap:
    """Per-bucket FLAT ``eidx [Nb·K]`` (row-major over the logical
    ``[Nb, K]`` block, matching the flat ELL storage): each slot's edge
    position in the graph's canonical (receiver-major) edge order; padding
    slots hold the sentinel ``e_pad``. Lets per-edge values computed in COO
    order (attention weights) ride the bucketed-ELL layout, so every
    per-receiver reduction (softmax max, softmax denominator, aggregation)
    becomes a length-K reduce + a segment op over ~N virtual rows instead
    of a per-edge scatter over E edge ids (13x fewer ids on arxiv-scale
    graphs)."""

    eidx: tuple
    sentinel: int


jax.tree_util.register_dataclass(EdgeMap, data_fields=["eidx"], meta_fields=["sentinel"])


def build_edge_map(graph: Graph) -> EdgeMap:
    """Host-side: replicate the ELL virtual-row chunking over edge IDs.

    Mirrors ``ops/ell.py: build_ell`` (and the native builder — both assign
    virtual rows to buckets in the same row-major scan order), but stores
    each slot's CSR/COO edge index instead of its value. Alignment with the
    built layout is pinned by ``test_gat.py::test_edge_map_reconstructs_vals``.
    """
    if graph.ell is None:
        raise ValueError("graph has no ELL layout (build with build_ell=True)")
    ell = graph.ell
    csr = graph.to_scipy().tocsr()
    indptr = csr.indptr
    n = graph.n_nodes
    ks = ell.ks
    kmax = ks[-1]
    deg = np.diff(indptr).astype(np.int64)

    n_chunks = np.maximum(1, -(-deg // kmax))
    vrow_row = np.repeat(np.arange(n, dtype=np.int64), n_chunks)
    first = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
    chunk_ofs = np.arange(vrow_row.size) - np.repeat(first, n_chunks)
    vstart = indptr[vrow_row] + chunk_ofs * kmax
    vlen = np.minimum(deg[vrow_row] - chunk_ofs * kmax, kmax)
    bucket = np.searchsorted(ks, np.maximum(vlen, 1))

    sentinel = graph.e_pad
    eidx_out = []
    for j, k in enumerate(ks):
        sel = np.nonzero(bucket == j)[0]
        if sel.size == 0:
            eidx_out.append(jnp.full(k, sentinel, jnp.int32))
            continue
        offs = np.arange(k)
        idx = vstart[sel][:, None] + offs
        valid = offs < vlen[sel][:, None]
        eidx = np.where(valid, idx, sentinel)
        eidx_out.append(jnp.asarray(eidx.astype(np.int32).reshape(-1)))
    return EdgeMap(eidx=tuple(eidx_out), sentinel=sentinel)


# Gather each bucket's source feature block once in pass 1 and reuse it for
# aggregation in pass 3, vs re-gathering plus a separate narrow [N, H] logit
# gather. MEASURED A WASH on the v5e forward (180.5 vs 182.9 ms at the
# arxiv GAT config — the slot gathers are not the bottleneck there) and an
# HBM OOM on the train step (every bucket's [nb, k, H·F'] block becomes an
# autodiff residual). Default stays False; the flag preserves the A/B.
REUSE_GATHER = False


def gat_conv_ell(
    graph: Graph,
    em: EdgeMap,
    s: jax.Array,  # [N, H, F'] per-head transformed features
    a_src: jax.Array,  # [H, F']
    a_dst: jax.Array,  # [H, F']
    negative_slope: float = 0.2,
    attn_dropout=None,  # optional (drop_fn(key_slot, arr), key_slot) pair
    stabilizer: str = "flash",
) -> jax.Array:
    """Slot-native GAT convolution: logits → softmax → aggregation entirely
    in ELL bucket blocks — **no per-edge tensor is ever materialized in COO
    order**, so no operation touches E edge ids:

    - sender logits gather by the layout's column blocks (node table, rows
      ≤ 32 B); receiver logits gather once per *virtual row* (~13x fewer);
    - softmax max/denominator reduce over the K axis inside each block,
      then segment over ~N virtual rows (cross-chunk correctness for rows
      split past K_max comes from that segment);
    - aggregation reuses the same column-block gather as the plain ELL SpMM
      with the attention value attached slot-wise.

    Measured motivation: each [E, H] gather/segment op costs 15-37 ms at
    arxiv scale while the whole ELL SpMM is 9.4 ms — the COO-order GAT
    formulation pays that per-edge toll ~6 times per layer.

    ``stabilizer="flash"`` (default) dispatches to the fused one-pass
    variant (:func:`gat_conv_ell_onepass`) — numerically EXACT (per-block
    local max + rescaled cross-block combine), one slot-gather sweep.
    ``stabilizer="segmax"`` keeps the explicit 3-pass formulation below.
    (The round-2 ``"bound"`` stabilizer — a node-level softmax bound whose
    -60 clamp silently degraded attention toward uniform when the bound was
    loose — is superseded by the exact combine and maps to it.)
    """
    if stabilizer in ("flash", "bound"):
        return gat_conv_ell_onepass(
            graph, em, s, a_src, a_dst, negative_slope, attn_dropout
        )
    if stabilizer != "segmax":
        raise ValueError(f"unknown stabilizer {stabilizer!r}")
    ell = graph.ell
    n, h, f = s.shape
    logit_src = None if REUSE_GATHER else jnp.einsum("nhf,hf->nh", s, a_src)
    logit_dst = jnp.einsum("nhf,hf->nh", s, a_dst)
    s2 = s.reshape(n, h * f)

    # pass 1: gather the source feature blocks ONCE, compute logits on the
    # gathered data (the sender logit becomes a VPU einsum on the block
    # instead of a second slot gather), per-vrow max partials
    g_blocks, e_blocks, valid_blocks, max_parts, vrows = [], [], [], [], []
    for cols, eidx, rows in zip(ell.cols, em.eidx, ell.rows):
        nb = rows.shape[0]
        k = cols.size // nb
        valid = (eidx.reshape(nb, k) != em.sentinel)[..., None]  # [nb, k, 1]
        if REUSE_GATHER:
            g = jnp.take(s2, cols, axis=0).reshape(nb, k, h, f)
            g_blocks.append(g)
            lsrc = jnp.einsum("bkhf,hf->bkh", g, a_src)
        else:
            g_blocks.append(None)
            lsrc = jnp.take(logit_src, cols, axis=0).reshape(nb, k, h)
        ldst = jnp.take(logit_dst, rows, axis=0)[:, None, :]  # [nb, 1, h]
        e = jax.nn.leaky_relu(lsrc + ldst, negative_slope)
        e = jnp.where(valid, e, -jnp.inf)
        e_blocks.append(e)
        valid_blocks.append(valid)
        max_parts.append(e.max(axis=1))  # [nb, h]
        vrows.append(rows)
    r = jnp.concatenate(vrows, axis=0)
    m = jax.ops.segment_max(
        jnp.concatenate(max_parts, axis=0), r, num_segments=n
    )
    m = jax.lax.stop_gradient(jnp.where(jnp.isfinite(m), m, 0.0))  # [N, H]

    # pass 2: exp + per-vrow denominator partials
    ex_blocks, den_parts = [], []
    for e, valid, rows in zip(e_blocks, valid_blocks, vrows):
        ex = jnp.exp(e - jnp.take(m, rows, axis=0)[:, None, :]) * valid
        ex_blocks.append(ex)
        den_parts.append(ex.sum(axis=1))
    denom = jax.ops.segment_sum(
        jnp.concatenate(den_parts, axis=0), r, num_segments=n
    )
    denom = jnp.maximum(denom, 1e-16)  # [N, H]

    # pass 3: alpha per slot, weighted combine over the pass-1 blocks
    out_parts = []
    for bi, (cols, ex, rows) in enumerate(zip(ell.cols, ex_blocks, vrows)):
        nb = rows.shape[0]
        k = cols.size // nb
        alpha = ex / jnp.take(denom, rows, axis=0)[:, None, :]  # [nb, k, h]
        if attn_dropout is not None:
            drop, slot = attn_dropout
            alpha = drop((slot, bi), alpha)
        g = g_blocks[bi]
        if g is None:
            g = jnp.take(s2, cols, axis=0).reshape(nb, k, h, f)
        out_parts.append((g * alpha[..., None]).reshape(nb, k, h * f).sum(axis=1))
    out = jax.ops.segment_sum(
        jnp.concatenate(out_parts, axis=0), r, num_segments=n
    )
    return out.reshape(n, h, f)


def gat_conv_ell_onepass(
    graph: Graph,
    em: EdgeMap,
    s: jax.Array,  # [N, H, F'] per-head transformed features
    a_src: jax.Array,  # [H, F']
    a_dst: jax.Array,  # [H, F']
    negative_slope: float = 0.2,
    attn_dropout=None,
) -> jax.Array:
    """One-pass GAT convolution, numerically EXACT via a flash-attention-
    style two-level softmax.

    Each virtual row computes its own LOCAL max over its ≤K slots (a free
    reduce on data already in registers), exponentiates against that local
    shift (``exp(e - local_max) <= 1``, no clamp, no precision loss), and
    emits per-vrow partial ``(numerator, denominator, local_max)``. The
    cross-vrow combine then rescales every partial by
    ``exp(local_max - segment_max(local_max))`` before the segment sums —
    algebraically identical to the exact per-receiver softmax (the local
    shifts cancel), which is the standard blockwise-softmax decomposition
    (Milakov & Gimelshein 2018; FlashAttention). This keeps the fused
    single-sweep structure (logits, exp, and weighted aggregation in one
    bucket loop — half the slot gathers the 3-pass ``segmax`` backward must
    revisit) WITHOUT the round-2 bound stabilizer's failure mode where all
    incoming logits sat far below a loose node-level bound and the -60
    clamp collapsed attention toward uniform.

    Attention dropout multiplies the unnormalized numerator only (the
    denominator uses undropped weights) — algebraically identical to
    dropping alpha; masks are drawn in per-head ``[nb, k, H]`` shape,
    bit-compatible with the segmax path.

    Layout: every per-slot tensor lives in **f-replicated ``[.., H·F]``
    lane space**. TPU pads the trailing dim to 128 lanes, so the obvious
    ``[nb, k, H]`` logit tensors are 16x-padded at H=8 — the measured
    profile put ~70% of the forward in exactly those narrow-lane ops. The
    per-head logits are replicated f-fold ONCE at node level (tiny
    ``[N, H·F]`` tensors), after which logits, exp, local maxes, partials,
    and the combine all ride full-lane tensors; the softmax division
    happens once per node.
    """
    ell = graph.ell
    n, h, f = s.shape
    rep = lambda t: jnp.repeat(t, f, axis=-1)
    logit_src = rep(jnp.einsum("nhf,hf->nh", s, a_src))
    logit_dst = rep(jnp.einsum("nhf,hf->nh", s, a_dst))
    s2 = s.reshape(n, h * f)
    valids = [
        eidx.reshape(rows.shape[0], -1) != em.sentinel
        for eidx, rows in zip(em.eidx, ell.rows)
    ]
    num, den, _m = _ell_attn_partials(
        ell, logit_src, logit_dst, s2, h, f, negative_slope, valids,
        attn_dropout,
    )
    return (num / jnp.maximum(den, 1e-16)).reshape(n, h, f)


def _ell_attn_partials(ell, logit_src, logit_dst, s2, h, f, negative_slope,
                       valids, attn_dropout=None):
    """Per-receiver attention partials over an ELL layout's edges.

    ``logit_src``/``logit_dst``: f-replicated ``[N, H·F]`` node logits;
    ``s2``: ``[N, H·F]`` features; ``valids``: per-bucket ``[nb, k]`` bool
    of real (non-padding) slots. Returns ``(num, den, m)``, all
    ``[N, H·F]`` (``den``/``m`` f-replicated): ``num = Σ exp(e - m[v]) s``,
    ``den = Σ exp(e - m[v])``, ``m`` the per-receiver max logit over THIS
    layout's edges (``-inf`` where a receiver has none, stop-gradiented).
    Dividing ``num/den`` yields the exact softmax over these edges;
    combining with another structure's partials is the rescaled flash merge
    (see :func:`gat_conv_hybrid`).
    """
    n = s2.shape[0]
    hf = h * f
    rep = lambda t: jnp.repeat(t, f, axis=-1)
    num_parts, den_parts, max_parts, vrows = [], [], [], []
    for bi, (cols, rows, valid2) in enumerate(zip(ell.cols, ell.rows, valids)):
        nb = rows.shape[0]
        k = cols.size // nb
        valid = valid2[..., None]  # [nb, k, 1]
        flat = cols.reshape(-1)
        lsrc = jnp.take(logit_src, flat, axis=0).reshape(nb, k, hf)
        ldst = jnp.take(logit_dst, rows, axis=0)[:, None, :]
        e = jax.nn.leaky_relu(lsrc + ldst, negative_slope)
        e = jnp.where(valid, e, -jnp.inf)
        # local max over this vrow's slots — f-replicated [nb, H*F]; -inf
        # only when every slot is padding (the all-padding vrows of an empty
        # bucket), handled by the shift/scale guards below.
        bmax = jax.lax.stop_gradient(e.max(axis=1))
        shift = jnp.where(jnp.isfinite(bmax), bmax, 0.0)
        # exp(e - local_max) <= 1 exactly; padding slots are exp(-inf) = 0.
        ex = jnp.exp(e - shift[:, None, :])  # [nb, k, H*F]
        den_parts.append(ex.sum(axis=1))  # [nb, H*F] (f-replicated values)
        if attn_dropout is not None:
            drop, slot = attn_dropout
            mask_in = jnp.ones((nb, k, h), ex.dtype)
            ex = ex * rep(drop((slot, bi), mask_in))
        g = jnp.take(s2, flat, axis=0).reshape(nb, k, hf)
        num_parts.append((g * ex).sum(axis=1))  # [nb, H*F]
        max_parts.append(bmax)
        vrows.append(rows)
    r = jnp.concatenate(vrows, axis=0)
    bmax = jnp.concatenate(max_parts, axis=0)  # [V, H*F]
    m = jax.ops.segment_max(bmax, r, num_segments=n)  # [N, H*F]
    shift_m = jax.lax.stop_gradient(jnp.where(jnp.isfinite(m), m, 0.0))
    # rescale each vrow's partials onto the receiver's global shift; the
    # local shifts cancel exactly (all-padding vrows get scale 0).
    scale = jnp.exp(bmax - jnp.take(shift_m, r, axis=0))  # [V, H*F]
    num = jax.ops.segment_sum(
        jnp.concatenate(num_parts, axis=0) * scale, r, num_segments=n
    )  # [N, H*F]
    den = jax.ops.segment_sum(
        jnp.concatenate(den_parts, axis=0) * scale, r, num_segments=n
    )  # [N, H*F]
    return num, den, jax.lax.stop_gradient(m)


def build_gat_tiles_t(graph: Graph):
    """Host-side: the EXACT transpose of the hybrid layout's forward tiles,
    for :func:`gat_conv_hybrid`'s sender-indexed backward kernel (see
    ``ops/pallas/gat_tile_attn.transpose_bcsr`` for why ``graph.hybrid_t``
    is not reused). Returns None when the hybrid layout has no tiles.

    Also verifies, host-side, that every real edge carries a NONZERO
    weight: :func:`gat_conv_hybrid` infers residual-slot validity from
    ``ell.vals != 0`` (the flat ELL stores no separate structural mask), so
    an explicitly-stored zero-weight edge would silently drop out of
    attention — diverging from the edge_map/COO paths, which are
    structural. Checking here turns that silent divergence into an error."""
    import numpy as np

    from pygcn_tpu.ops.pallas.gat_tile_attn import transpose_bcsr

    if graph.hybrid is None:
        raise ValueError("graph has no hybrid layout; build with build_hybrid=True")
    w = np.asarray(graph.weights[: graph.n_edges])
    if w.size and not np.all(w != 0):
        raise ValueError(
            "gat_conv_hybrid requires all real edge weights to be nonzero "
            "(residual-slot validity is inferred from vals != 0); found "
            f"{int((w == 0).sum())} zero-weight edges — use the edge_map "
            "(gat_conv_ell) path for graphs with explicit zero edges"
        )
    if graph.hybrid.bcsr is None:
        return None
    return transpose_bcsr(graph.hybrid.bcsr)


def gat_conv_hybrid(
    graph: Graph,
    tiles_t,  # build_gat_tiles_t(graph) — exact transpose tiles (or None)
    s: jax.Array,  # [N, H, F'] per-head transformed features
    a_src: jax.Array,  # [H, F']
    a_dst: jax.Array,  # [H, F']
    negative_slope: float = 0.2,
) -> jax.Array:
    """GAT convolution on the hybrid BCSR+ELL layout: attention for the
    ~70% of edges inside dense 128×128 tiles runs as a fused Pallas
    VMEM kernel (``ops/pallas/gat_tile_attn.py`` — logits, masked exp, and
    the weighted MXU accumulation never leave VMEM, and the backward is
    gather-free kernels over the transpose tiles), while residual edges
    ride the slot-native ELL path. Both sides emit per-receiver
    ``(num, den, max)`` partials; the exact softmax over the FULL
    neighborhood is the rescaled flash merge of the two.

    Requires ``graph.hybrid`` with an ELL residual (colpanel residuals are
    a large-graph SpMM layout; build the graph with
    ``hybrid_residual='ell'`` for attention). Attention dropout is not
    supported on this path — use the ELL path (``edge_map``) when training
    with attention dropout.
    """
    from pygcn_tpu.ops.ell import ELL
    from pygcn_tpu.ops.pallas.gat_tile_attn import NEG, gat_tile_partials

    hy = graph.hybrid
    if hy is None:
        raise ValueError("graph has no hybrid layout; build with build_hybrid=True")
    if not isinstance(hy.ell, ELL):
        raise ValueError(
            "hybrid attention needs an ELL residual (hybrid_residual='ell')"
        )
    if hy.bcsr is not None and tiles_t is None:
        raise ValueError("pass tiles_t=build_gat_tiles_t(graph)")
    n, h, f = s.shape
    rep = lambda t: jnp.repeat(t, f, axis=-1)
    lsrc_n = jnp.einsum("nhf,hf->nh", s, a_src)  # [N, H]
    ldst_n = jnp.einsum("nhf,hf->nh", s, a_dst)
    s2 = s.reshape(n, h * f)

    # residual (non-tile) edges: a slot is real iff it carries a stored
    # adjacency value (normalized adjacencies are > 0 on real edges)
    ell = hy.ell
    valids = [
        v.reshape(r.shape[0], -1) != 0 for v, r in zip(ell.vals, ell.rows)
    ]
    num_e, den_e, m_e = _ell_attn_partials(
        ell, rep(lsrc_n), rep(ldst_n), s2, h, f, negative_slope, valids
    )
    if hy.bcsr is None:
        return (num_e / jnp.maximum(den_e, 1e-16)).reshape(n, h, f)

    num_t, den_t, m_t = gat_tile_partials(
        (h, f, negative_slope), hy.bcsr, tiles_t, lsrc_n, ldst_n, s2
    )
    m_t = rep(m_t)
    den_t = rep(den_t)
    # exact cross-structure softmax: rescale both partial sets onto the
    # combined per-receiver max (receivers with no edges at all end up
    # 0/max(0,eps) = 0, matching edge_softmax's zero rows)
    m_comb = jax.lax.stop_gradient(jnp.maximum(m_t, m_e))
    shift = jnp.where(m_comb > -1e29, m_comb, 0.0)
    st = jnp.exp(m_t - shift)
    se = jnp.exp(jnp.where(jnp.isfinite(m_e), m_e, NEG) - shift)
    num = num_t * st + num_e * se
    den = den_t * st + den_e * se
    return (num / jnp.maximum(den, 1e-16)).reshape(n, h, f)


def gatv2_conv_ell(
    graph: Graph,
    em: EdgeMap,
    s_l: jax.Array,  # [N, H, F'] source transform (x @ W_l)
    s_r: jax.Array,  # [N, H, F'] receiver transform (x @ W_r)
    a: jax.Array,  # [H, F']
    negative_slope: float = 0.2,
    attn_dropout=None,
    stabilizer: str = "flash",
) -> jax.Array:
    """Slot-native GATv2 convolution (see :func:`gat_conv_ell` for the
    layout rationale). The v2 logit ``a · leaky_relu(s_l[u] + s_r[v])``
    needs the full feature vector per slot, so pass 1 gathers the source
    block ``[nb, k, H·F']`` and (with ``REUSE_GATHER``) keeps it for the
    pass-3 aggregation — the re-gather variant stays available for A/B via
    the module flag.

    ``stabilizer="flash"`` (default) dispatches to
    :func:`gatv2_conv_ell_onepass`. Note the round-2 v1 ``bound``
    stabilizer does NOT transfer to v2 — the nonlinearity precedes the
    attention vector, so the logit is not monotone in a separable node term
    and no node-level bound exists — but the exact per-vrow local-max
    combine needs no bound at all, so v2 gets the same one-pass treatment.
    """
    if stabilizer in ("flash", "bound"):
        return gatv2_conv_ell_onepass(
            graph, em, s_l, s_r, a, negative_slope, attn_dropout
        )
    if stabilizer != "segmax":
        raise ValueError(f"unknown stabilizer {stabilizer!r}")
    ell = graph.ell
    n, h, f = s_l.shape
    sl2 = s_l.reshape(n, h * f)
    sr2 = s_r.reshape(n, h * f)

    # pass 1: per-slot v2 logits, per-vrow max partials
    g_blocks, e_blocks, valid_blocks, max_parts, vrows = [], [], [], [], []
    for cols, eidx, rows in zip(ell.cols, em.eidx, ell.rows):
        nb = rows.shape[0]
        k = cols.size // nb
        valid = (eidx.reshape(nb, k) != em.sentinel)[..., None]  # [nb, k, 1]
        g = jnp.take(sl2, cols, axis=0).reshape(nb, k, h, f)
        g_blocks.append(g if REUSE_GATHER else None)
        d = jnp.take(sr2, rows, axis=0).reshape(nb, 1, h, f)
        e = jnp.einsum(
            "bkhf,hf->bkh", jax.nn.leaky_relu(g + d, negative_slope), a
        )
        e = jnp.where(valid, e, -jnp.inf)
        e_blocks.append(e)
        valid_blocks.append(valid)
        max_parts.append(e.max(axis=1))  # [nb, h]
        vrows.append(rows)
    r = jnp.concatenate(vrows, axis=0)
    m = jax.ops.segment_max(
        jnp.concatenate(max_parts, axis=0), r, num_segments=n
    )
    m = jax.lax.stop_gradient(jnp.where(jnp.isfinite(m), m, 0.0))  # [N, H]

    # pass 2: exp + per-vrow denominator partials
    ex_blocks, den_parts = [], []
    for e, valid, rows in zip(e_blocks, valid_blocks, vrows):
        ex = jnp.exp(e - jnp.take(m, rows, axis=0)[:, None, :]) * valid
        ex_blocks.append(ex)
        den_parts.append(ex.sum(axis=1))
    denom = jax.ops.segment_sum(
        jnp.concatenate(den_parts, axis=0), r, num_segments=n
    )
    denom = jnp.maximum(denom, 1e-16)  # [N, H]

    # pass 3: alpha per slot, weighted combine over the pass-1 blocks
    out_parts = []
    for bi, (cols, ex, rows) in enumerate(zip(ell.cols, ex_blocks, vrows)):
        nb = rows.shape[0]
        k = cols.size // nb
        alpha = ex / jnp.take(denom, rows, axis=0)[:, None, :]  # [nb, k, h]
        if attn_dropout is not None:
            drop, slot = attn_dropout
            alpha = drop((slot, bi), alpha)
        g = g_blocks[bi]
        if g is None:
            g = jnp.take(sl2, cols, axis=0).reshape(nb, k, h, f)
        out_parts.append((g * alpha[..., None]).reshape(nb, k, h * f).sum(axis=1))
    out = jax.ops.segment_sum(
        jnp.concatenate(out_parts, axis=0), r, num_segments=n
    )
    return out.reshape(n, h, f)


def gatv2_conv_ell_onepass(
    graph: Graph,
    em: EdgeMap,
    s_l: jax.Array,  # [N, H, F'] source transform (x @ W_l)
    s_r: jax.Array,  # [N, H, F'] receiver transform (x @ W_r)
    a: jax.Array,  # [H, F']
    negative_slope: float = 0.2,
    attn_dropout=None,
) -> jax.Array:
    """One-pass GATv2 via the exact flash-style two-level softmax (see
    :func:`gat_conv_ell_onepass`). The payoff is larger than for v1: the
    3-pass v2 gathers the wide ``[nb, k, H·F']`` source block TWICE per
    bucket (logits pass + aggregation pass, ``REUSE_GATHER=False`` to avoid
    autodiff residual OOM); fusing makes it ONE gather whose block feeds
    both the logit einsum and the weighted aggregation. The per-slot logit
    ``[nb, k, H]`` is inherently narrow for v2 (it is a reduction over F),
    so the exp/scale algebra runs f-replicated like v1."""
    ell = graph.ell
    n, h, f = s_l.shape
    valids = [
        eidx.reshape(rows.shape[0], -1) != em.sentinel
        for eidx, rows in zip(em.eidx, ell.rows)
    ]
    num, den, _m = _ell_attn_partials_v2(
        ell, s_l.reshape(n, h * f), s_r.reshape(n, h * f), a, h, f,
        negative_slope, valids, attn_dropout,
    )
    return (num / jnp.maximum(den, 1e-16)).reshape(n, h, f)


def _ell_attn_partials_v2(ell, sl2, sr2, a, h, f, negative_slope, valids,
                          attn_dropout=None):
    """Per-receiver GATv2 attention partials over an ELL layout's edges —
    the v2 analog of :func:`_ell_attn_partials` (same return contract:
    ``(num, den, m)``, all ``[N, H·F]`` with ``den``/``m`` f-replicated;
    ``m`` is ``-inf`` where a receiver has no edge in this layout), so the
    hybrid path can flash-merge residual partials with tile partials."""
    n = sl2.shape[0]
    hf = h * f
    rep = lambda t: jnp.repeat(t, f, axis=-1)

    num_parts, den_parts, max_parts, vrows = [], [], [], []
    for bi, (cols, rows, valid2) in enumerate(zip(ell.cols, ell.rows, valids)):
        nb = rows.shape[0]
        k = cols.size // nb
        valid = valid2[..., None]  # [nb, k, 1]
        g = jnp.take(sl2, cols.reshape(-1), axis=0).reshape(nb, k, h, f)
        d = jnp.take(sr2, rows, axis=0).reshape(nb, 1, h, f)
        e = jnp.einsum(
            "bkhf,hf->bkh", jax.nn.leaky_relu(g + d, negative_slope), a
        )
        e = rep(e)  # [nb, k, H*F] — full-lane for the exp/scale algebra
        e = jnp.where(valid, e, -jnp.inf)
        bmax = jax.lax.stop_gradient(e.max(axis=1))  # [nb, H*F]
        shift = jnp.where(jnp.isfinite(bmax), bmax, 0.0)
        ex = jnp.exp(e - shift[:, None, :])  # [nb, k, H*F]; padding -> 0
        den_parts.append(ex.sum(axis=1))
        if attn_dropout is not None:
            drop, slot = attn_dropout
            mask_in = jnp.ones((nb, k, h), ex.dtype)
            ex = ex * rep(drop((slot, bi), mask_in))
        num_parts.append((g.reshape(nb, k, hf) * ex).sum(axis=1))
        max_parts.append(bmax)
        vrows.append(rows)
    r = jnp.concatenate(vrows, axis=0)
    bmax = jnp.concatenate(max_parts, axis=0)
    m = jax.ops.segment_max(bmax, r, num_segments=n)
    shift_m = jax.lax.stop_gradient(jnp.where(jnp.isfinite(m), m, 0.0))
    scale = jnp.exp(bmax - jnp.take(shift_m, r, axis=0))
    num = jax.ops.segment_sum(
        jnp.concatenate(num_parts, axis=0) * scale, r, num_segments=n
    )
    den = jax.ops.segment_sum(
        jnp.concatenate(den_parts, axis=0) * scale, r, num_segments=n
    )
    return num, den, jax.lax.stop_gradient(m)


def gatv2_conv_hybrid(
    graph: Graph,
    tiles_t,  # build_gat_tiles_t(graph) — exact transpose tiles (or None)
    s_l: jax.Array,  # [N, H, F'] source transform (x @ W_l)
    s_r: jax.Array,  # [N, H, F'] receiver transform (x @ W_r)
    a: jax.Array,  # [H, F']
    negative_slope: float = 0.2,
) -> jax.Array:
    """GATv2 convolution on the hybrid BCSR+ELL layout (VERDICT r3 #5):
    tile edges run the fused Pallas v2 tile-attention kernel
    (``ops/pallas/gat_tile_attn.gatv2_tile_partials`` — the per-edge-pair
    F-reduction logit is an F-loop of broadcast FMAs in VMEM, and the
    backward replaces the slot-gather scatters with receiver/sender
    kernels over forward/transpose tiles), residual edges ride the
    slot-native v2 one-pass; the exact softmax over the full neighborhood
    is the rescaled flash merge of the two partial sets — the same
    structure as v1's :func:`gat_conv_hybrid`.

    Same constraints as v1: needs ``graph.hybrid`` with an ELL residual,
    all-nonzero edge weights (checked by :func:`build_gat_tiles_t`), no
    attention dropout on this path.
    """
    from pygcn_tpu.ops.ell import ELL
    from pygcn_tpu.ops.pallas.gat_tile_attn import NEG, gatv2_tile_partials

    hy = graph.hybrid
    if hy is None:
        raise ValueError("graph has no hybrid layout; build with build_hybrid=True")
    if not isinstance(hy.ell, ELL):
        raise ValueError(
            "hybrid attention needs an ELL residual (hybrid_residual='ell')"
        )
    if hy.bcsr is not None and tiles_t is None:
        raise ValueError("pass tiles_t=build_gat_tiles_t(graph)")
    n, h, f = s_l.shape
    rep = lambda t: jnp.repeat(t, f, axis=-1)
    sl2 = s_l.reshape(n, h * f)
    sr2 = s_r.reshape(n, h * f)

    ell = hy.ell
    valids = [
        v.reshape(r.shape[0], -1) != 0 for v, r in zip(ell.vals, ell.rows)
    ]
    num_e, den_e, m_e = _ell_attn_partials_v2(
        ell, sl2, sr2, a, h, f, negative_slope, valids
    )
    if hy.bcsr is None:
        return (num_e / jnp.maximum(den_e, 1e-16)).reshape(n, h, f)

    num_t, den_t, m_t = gatv2_tile_partials(
        (h, f, negative_slope), hy.bcsr, tiles_t, sl2, sr2, a
    )
    m_t = rep(m_t)
    den_t = rep(den_t)
    m_comb = jax.lax.stop_gradient(jnp.maximum(m_t, m_e))
    shift = jnp.where(m_comb > -1e29, m_comb, 0.0)
    st = jnp.exp(m_t - shift)
    se = jnp.exp(jnp.where(jnp.isfinite(m_e), m_e, NEG) - shift)
    num = num_t * st + num_e * se
    den = den_t * st + den_e * se
    return (num / jnp.maximum(den, 1e-16)).reshape(n, h, f)
