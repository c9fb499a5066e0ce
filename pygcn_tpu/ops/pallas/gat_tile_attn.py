"""Pallas TPU fused tile attention for GAT — MXU/VPU attention on the
hybrid layout's dense 128×128 tiles.

The slot-native ELL GAT (``ops/gat.py``) is gather-bound: every per-slot
tensor rides XLA's HBM gather machinery, and the backward's scatter-adds of
the two slot gathers are the measured wall (PERF_NOTES r2: 50.6 ms fwd /
161 ms step at the arxiv config). On a locality-ordered community graph
~70% of edges sit inside dense 128×128 tiles (the hybrid SpMM's MXU side) —
for those edges attention needs NO gather at all: a tile couples a
contiguous 128-row receiver block with a contiguous 128-row sender block,
so the logits/exp/weighted-sum for all its edges are dense VPU/MXU ops on
contiguous slices held in VMEM. Arbitrary-index gathers are impossible in
Mosaic (the r1 negative result); *contiguous-block* indexing via scalar-
prefetched tile coordinates is exactly what BlockSpec index maps do.

Per tile (receiver block r = block_rows[i], sender block c = block_cols[i]):

    e[v, u]  = leaky_relu(ldst[v] + lsrc[u])          per head (VPU)
    masked by the tile's adjacency pattern
    online-softmax accumulation over the tiles of each block row
    (flash-attention style: running max / corrected num & den),
    num[v]  += exp(e - m) @ s[c·128 : c·128+128]       per head (MXU)

The kernel emits per-receiver PARTIALS ``(num, den, m)`` rather than
normalized outputs: a receiver's neighborhood spans tile edges AND residual
(non-tile) edges, so the exact softmax is completed outside by the same
rescaled flash combine the ELL one-pass uses (``ops/gat.py:
gat_conv_ell_onepass``), merging tile partials with ELL-residual partials.

Backward is two Pallas kernels over the same tile structure (custom_vjp):
the receiver-indexed gradient (dldst) accumulates over row-sorted forward
tiles, and the sender-indexed gradients (ds, dlsrc) accumulate over the
transpose tiles (prebuilt in ``HybridLayout``'s transpose; symmetric graphs
reuse the forward tiles) — both reuse the SpMM kernel's revisiting-output
pattern, so no scatter ever materializes.

Reference analog: the attention scorer at reference ``pygcn/models.py:
316-329`` is the closest op; this kernel is a TPU-native design for the GAT
family extension, not a port.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pygcn_tpu.graph.graph import BCSR

NEG = -1e30  # finite -inf stand-in (f32-safe max/exp algebra, no NaNs)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def transpose_bcsr(bcsr: BCSR) -> BCSR:
    """Host-side EXACT transpose of a tile set (same edges, coordinates
    swapped, tiles re-sorted by block row).

    The backward's sender-indexed kernel iterates transpose tiles; it must
    see exactly the forward tile edges. ``HybridLayout``'s own transpose is
    built by re-running tile selection on ``A^T``, whose budget-cap
    tie-breaking can route a borderline tile pair differently — so the
    transpose used for the attention backward is derived from the forward
    tiles directly."""
    import numpy as np

    data = np.asarray(bcsr.data)
    br = np.asarray(bcsr.block_rows)
    bc = np.asarray(bcsr.block_cols)
    order = np.lexsort((br, bc))
    nbr = bc[order].astype(np.int32)
    nbc = br[order].astype(np.int32)
    nd = data[order].transpose(0, 2, 1)
    n_block_rows = bcsr.n_block_cols
    n_block_cols = bcsr.n_block_rows
    empty = np.setdiff1d(np.arange(n_block_rows, dtype=np.int64), nbr)
    if empty.size:
        nd = np.concatenate(
            [nd, np.zeros((empty.size, bcsr.tk, bcsr.tm), nd.dtype)])
        nbr = np.concatenate([nbr, empty.astype(np.int32)])
        nbc = np.concatenate([nbc, np.zeros(empty.size, np.int32)])
        o2 = np.lexsort((nbc, nbr))
        nd, nbr, nbc = nd[o2], nbr[o2], nbc[o2]
    ptr = np.zeros(n_block_rows + 1, np.int64)
    np.add.at(ptr, nbr + 1, 1)
    ptr = np.cumsum(ptr).astype(np.int32)
    return BCSR(
        data=jnp.asarray(nd), block_rows=jnp.asarray(nbr),
        block_cols=jnp.asarray(nbc), block_row_ptr=jnp.asarray(ptr),
        tm=bcsr.tk, tk=bcsr.tm,
        n_block_rows=n_block_rows, n_block_cols=n_block_cols,
    )


def _leaky(x, slope):
    return jnp.where(x >= 0, x, slope * x)


# --------------------------------------------------------------------- #
# forward kernel
# --------------------------------------------------------------------- #

# A/B flag: emit PER-TILE partials merged by XLA segment ops instead of
# read-modify-write accumulation into per-block-row outputs. MEASURED
# (r3, clean sessions at the clustered-arxiv config): train step identical
# (141.2 vs 142.2 ms), forward favored revisit modulo large tunnel-session
# variance; the sibling BCSR kernel's streaming lost outright. Revisit
# stays the default; the streamed variant is kept for future pods where
# the tradeoff may differ.
TILE_REVISIT = True


def _fwd_kernel_revisit(h, f, slope, br_ref, bc_ref, mask_ref, lsrcT_ref,
                        ldst_ref, s_ref, num_ref, den_ref, max_ref):
    i = pl.program_id(0)
    prev = br_ref[jnp.maximum(i - 1, 0)]
    first_of_row = jnp.logical_or(i == 0, br_ref[i] != prev)

    @pl.when(first_of_row)
    def _():
        num_ref[...] = jnp.zeros_like(num_ref)
        den_ref[...] = jnp.zeros_like(den_ref)
        max_ref[...] = jnp.full_like(max_ref, NEG)

    mask = mask_ref[0] != 0  # [tm, tk]
    for hh in range(h):
        lsrc = lsrcT_ref[hh : hh + 1, :]  # [1, tk]
        ldst = ldst_ref[:, hh : hh + 1]  # [tm, 1]
        e = _leaky(ldst + lsrc, slope)  # [tm, tk]
        neg = jnp.where(mask, e, NEG)
        tmax = jnp.max(neg, axis=1, keepdims=True)  # [tm, 1]
        m_old = max_ref[:, hh : hh + 1]
        m_new = jnp.maximum(m_old, tmax)
        ex = jnp.where(mask, jnp.exp(neg - m_new), 0.0)  # [tm, tk]
        corr = jnp.exp(m_old - m_new)  # [tm, 1]; NEG-NEG -> exp(0)=1, den stays 0
        den_ref[:, hh : hh + 1] = den_ref[:, hh : hh + 1] * corr + jnp.sum(
            ex, axis=1, keepdims=True
        )
        sl = s_ref[:, hh * f : (hh + 1) * f]  # [tk, F]
        num_ref[:, hh * f : (hh + 1) * f] = num_ref[
            :, hh * f : (hh + 1) * f
        ] * corr + jnp.dot(ex, sl, preferred_element_type=jnp.float32)
        max_ref[:, hh : hh + 1] = m_new


def _fwd_kernel_stream(h, f, slope, br_ref, bc_ref, mask_ref, lsrcT_ref,
                       ldst_ref, s_ref, num_ref, den_ref, max_ref):
    """Per-tile partials: local max over the tile's own edges, exp against
    it, weighted sum — no cross-tile state, every output block fresh."""
    mask = mask_ref[0] != 0  # [tm, tk]
    for hh in range(h):
        lsrc = lsrcT_ref[hh : hh + 1, :]  # [1, tk]
        ldst = ldst_ref[:, hh : hh + 1]  # [tm, 1]
        e = _leaky(ldst + lsrc, slope)  # [tm, tk]
        neg = jnp.where(mask, e, NEG)
        tmax = jnp.max(neg, axis=1, keepdims=True)  # [tm, 1]
        shift = jnp.maximum(tmax, NEG)  # == tmax; NEG rows give exp(0)*mask=0
        ex = jnp.where(mask, jnp.exp(neg - shift), 0.0)
        den_ref[0, :, hh : hh + 1] = jnp.sum(ex, axis=1, keepdims=True)
        max_ref[0, :, hh : hh + 1] = tmax
        num_ref[0, :, hh * f : (hh + 1) * f] = jnp.dot(
            ex, s_ref[:, hh * f : (hh + 1) * f],
            preferred_element_type=jnp.float32,
        )


def _run_fwd(bcsr: BCSR, lsrcT, ldst, s2, h: int, f: int, slope: float):
    tm, tk = bcsr.tm, bcsr.tk
    t = bcsr.data.shape[0]
    n_rows_pad = bcsr.n_block_rows * tm
    hf = h * f

    if TILE_REVISIT:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(t,),
            in_specs=[
                pl.BlockSpec((1, tm, tk), lambda i, br, bc: (i, 0, 0)),
                pl.BlockSpec((h, tk), lambda i, br, bc: (0, bc[i])),
                pl.BlockSpec((tm, h), lambda i, br, bc: (br[i], 0)),
                pl.BlockSpec((tk, hf), lambda i, br, bc: (bc[i], 0)),
            ],
            out_specs=[
                pl.BlockSpec((tm, hf), lambda i, br, bc: (br[i], 0)),
                pl.BlockSpec((tm, h), lambda i, br, bc: (br[i], 0)),
                pl.BlockSpec((tm, h), lambda i, br, bc: (br[i], 0)),
            ],
        )
        num, den, mx = pl.pallas_call(
            functools.partial(_fwd_kernel_revisit, h, f, slope),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_rows_pad, hf), jnp.float32),
                jax.ShapeDtypeStruct((n_rows_pad, h), jnp.float32),
                jax.ShapeDtypeStruct((n_rows_pad, h), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=t * h * tm * tk * (8 + 2 * f),
                bytes_accessed=(t * (tm * tk + tk * hf + 2 * tm * hf)) * 4,
                transcendentals=2 * t * h * tm * tk,
            ),
            interpret=_interpret(),
        )(bcsr.block_rows, bcsr.block_cols, bcsr.data, lsrcT, ldst, s2)
        return num, den, mx

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, tm, tk), lambda i, br, bc: (i, 0, 0)),
            pl.BlockSpec((h, tk), lambda i, br, bc: (0, bc[i])),
            pl.BlockSpec((tm, h), lambda i, br, bc: (br[i], 0)),
            pl.BlockSpec((tk, hf), lambda i, br, bc: (bc[i], 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tm, hf), lambda i, br, bc: (i, 0, 0)),
            pl.BlockSpec((1, tm, h), lambda i, br, bc: (i, 0, 0)),
            pl.BlockSpec((1, tm, h), lambda i, br, bc: (i, 0, 0)),
        ],
    )
    num_t, den_t, max_t = pl.pallas_call(
        functools.partial(_fwd_kernel_stream, h, f, slope),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t, tm, hf), jnp.float32),
            jax.ShapeDtypeStruct((t, tm, h), jnp.float32),
            jax.ShapeDtypeStruct((t, tm, h), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=t * h * tm * tk * (8 + 2 * f),
            bytes_accessed=(t * (tm * tk + tk * hf + tm * hf + 2 * tm * h)) * 4,
            transcendentals=t * h * tm * tk,
        ),
        interpret=_interpret(),
    )(bcsr.block_rows, bcsr.block_cols, bcsr.data, lsrcT, ldst, s2)
    # cross-tile flash merge in XLA: segment ops keyed by each tile's
    # global receiver rows. The ids are only BLOCK-sorted — each tile of a
    # block row restarts its run at r*tm, so the flattened sequence is NOT
    # sorted whenever a block row owns >1 tile; claiming sortedness would
    # be undefined behavior on TPU (CPU interpret ignores the hint).
    seg = (bcsr.block_rows[:, None] * tm
           + jax.lax.broadcasted_iota(jnp.int32, (t, tm), 1)).reshape(-1)
    max_flat = max_t.reshape(t * tm, h)
    mx = jax.ops.segment_max(max_flat, seg, num_segments=n_rows_pad)
    shift = jnp.where(mx > -1e29, mx, 0.0)
    scale = jnp.exp(max_flat - jnp.take(shift, seg, axis=0))  # [T*tm, h]
    den = jax.ops.segment_sum(den_t.reshape(t * tm, h) * scale, seg,
                              num_segments=n_rows_pad)
    scale_f = jnp.repeat(scale, f, axis=-1)  # [T*tm, hf]
    num = jax.ops.segment_sum(num_t.reshape(t * tm, hf) * scale_f, seg,
                              num_segments=n_rows_pad)
    return num, den, mx


# --------------------------------------------------------------------- #
# backward kernels
# --------------------------------------------------------------------- #


def _bwd_dldst_kernel(h, f, slope, stream, br_ref, bc_ref, mask_ref,
                      lsrcT_ref, ldst_ref, s_ref, m_ref, dnum_ref, dden_ref,
                      dldst_ref):
    """Receiver-indexed gradient over row-sorted forward tiles.

    ``stream=True`` writes per-tile partials (fresh block per step, merged
    by an XLA segment_sum outside); ``False`` keeps the revisit pattern."""
    if not stream:
        i = pl.program_id(0)
        prev = br_ref[jnp.maximum(i - 1, 0)]
        first_of_row = jnp.logical_or(i == 0, br_ref[i] != prev)

        @pl.when(first_of_row)
        def _():
            dldst_ref[...] = jnp.zeros_like(dldst_ref)

    mask = mask_ref[0] != 0
    for hh in range(h):
        lsrc = lsrcT_ref[hh : hh + 1, :]  # [1, tk]
        ldst = ldst_ref[:, hh : hh + 1]  # [tm, 1]
        pre = ldst + lsrc
        e = _leaky(pre, slope)
        m = m_ref[:, hh : hh + 1]  # [tm, 1] kernel-local row max
        p = jnp.where(mask, jnp.exp(e - m), 0.0)  # unnormalized, local shift
        # d e = p * (s_u . dnum_v + dden_v), per head
        gdot = jax.lax.dot_general(
            dnum_ref[:, hh * f : (hh + 1) * f],  # [tm, F]
            s_ref[:, hh * f : (hh + 1) * f],  # [tk, F]
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [tm, tk]
        de = p * (gdot + dden_ref[:, hh : hh + 1])
        de = de * jnp.where(pre >= 0, 1.0, slope)
        if stream:
            dldst_ref[0, :, hh : hh + 1] = jnp.sum(de, axis=1, keepdims=True)
        else:
            dldst_ref[:, hh : hh + 1] += jnp.sum(de, axis=1, keepdims=True)


def _bwd_sender_kernel(h, f, slope, stream, br_ref, bc_ref, mask_ref,
                       lsrc_ref, ldstT_ref, s_ref, mT_ref, dnum_ref,
                       ddenT_ref, ds_ref, dlsrc_ref):
    """Sender-indexed gradients over TRANSPOSE tiles (block rows = senders).

    For transpose tile i: rows u are senders, cols v are receivers; the
    forward edge is (u -> v) with logit ``leaky(lsrc[u] + ldst[v])``.
    """
    if not stream:
        i = pl.program_id(0)
        prev = br_ref[jnp.maximum(i - 1, 0)]
        first_of_row = jnp.logical_or(i == 0, br_ref[i] != prev)

        @pl.when(first_of_row)
        def _():
            ds_ref[...] = jnp.zeros_like(ds_ref)
            dlsrc_ref[...] = jnp.zeros_like(dlsrc_ref)

    mask = mask_ref[0] != 0  # [tm(u), tk(v)]
    for hh in range(h):
        lsrc = lsrc_ref[:, hh : hh + 1]  # [tm, 1] sender logits
        ldst = ldstT_ref[hh : hh + 1, :]  # [1, tk] receiver logits
        pre = lsrc + ldst
        e = _leaky(pre, slope)
        m = mT_ref[hh : hh + 1, :]  # [1, tk] receiver row max
        p = jnp.where(mask, jnp.exp(e - m), 0.0)  # [tm(u), tk(v)]
        dnum_h = dnum_ref[:, hh * f : (hh + 1) * f]  # [tk(v), F]
        # ds_u += sum_v p_uv * dnum_v
        dsv = jnp.dot(p, dnum_h, preferred_element_type=jnp.float32)
        gdot = jax.lax.dot_general(
            s_ref[:, hh * f : (hh + 1) * f],  # [tm(u), F]
            dnum_h,  # [tk(v), F]
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [tm, tk]
        de = p * (gdot + ddenT_ref[hh : hh + 1, :])
        de = de * jnp.where(pre >= 0, 1.0, slope)
        dlv = jnp.sum(de, axis=1, keepdims=True)
        if stream:
            ds_ref[0, :, hh * f : (hh + 1) * f] = dsv
            dlsrc_ref[0, :, hh : hh + 1] = dlv
        else:
            ds_ref[:, hh * f : (hh + 1) * f] += dsv
            dlsrc_ref[:, hh : hh + 1] += dlv


# --------------------------------------------------------------------- #
# custom-vjp wrapper
# --------------------------------------------------------------------- #


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def gat_tile_partials(meta, bcsr, bcsr_t, lsrc, ldst, s2):
    """Per-receiver attention partials over the dense-tile edges.

    ``meta = (h, f, slope)`` (static); ``bcsr``/``bcsr_t`` are the hybrid
    layout's forward/transpose tiles (tile VALUES only gate the mask — GAT
    attends over structure). ``lsrc``/``ldst``: per-head logits ``[N, H]``;
    ``s2``: transformed features ``[N, H·F]``.

    Returns ``(num [N, H·F], den [N, H], m [N, H])`` with ``m`` the
    per-receiver max over TILE edges (``NEG`` where a receiver has none) —
    combine with residual-edge partials via the rescaled flash merge.
    ``m`` is non-differentiable (standard safe-softmax treatment); its
    cotangent is ignored.
    """
    num, den, mx = _tile_fwd_impl(meta, bcsr, lsrc, ldst, s2)
    return num, den, mx


def _tile_fwd_impl(meta, bcsr, lsrc, ldst, s2):
    h, f, slope = meta
    n = s2.shape[0]
    tk = bcsr.tk
    n_cols_pad = bcsr.n_block_cols * tk
    pad = n_cols_pad - n
    s2p = jnp.pad(s2, ((0, pad), (0, 0))) if pad else s2
    ldst_p = jnp.pad(ldst, ((0, pad), (0, 0))) if pad else ldst
    lsrcT = jnp.pad(lsrc, ((0, pad), (0, 0))).T if pad else lsrc.T
    num, den, mx = _run_fwd(bcsr, lsrcT, ldst_p, s2p, h, f, slope)
    return num[:n], den[:n], mx[:n]


def _tile_vjp_fwd(meta, bcsr, bcsr_t, lsrc, ldst, s2):
    num, den, mx = _tile_fwd_impl(meta, bcsr, lsrc, ldst, s2)
    return (num, den, mx), (bcsr, bcsr_t, lsrc, ldst, s2, mx)


def _tile_vjp_bwd(meta, res, cts):
    h, f, slope = meta
    bcsr, bcsr_t, lsrc, ldst, s2, mx = res
    dnum, dden, _dm = cts  # m is treated as constant (safe-softmax shifts)
    n = s2.shape[0]
    hf = h * f
    tm, tk = bcsr.tm, bcsr.tk
    # The backward pads every operand to n_block_cols*tk (and the sender
    # pass to bcsr_t's space) but indexes some by block ROW and others by
    # block COL; the two padded spaces coincide only for square tiles over
    # the shared node space. Make that assumption explicit.
    if tm != tk or bcsr_t.tm != bcsr_t.tk:
        raise ValueError(
            "gat_tile_partials backward requires square tiles (tm == tk); "
            f"got ({tm}, {tk}) / ({bcsr_t.tm}, {bcsr_t.tk})"
        )

    def padded(a, rows):
        p = rows - a.shape[0]
        return jnp.pad(a, ((0, p), (0, 0))) if p else a

    n_pad = bcsr.n_block_cols * tk

    lsrc_p = padded(lsrc, n_pad)
    ldst_p = padded(ldst, n_pad)
    s2_p = padded(s2, n_pad)
    m_p = padded(mx, n_pad)
    dnum_p = padded(dnum, n_pad)
    dden_p = padded(dden, n_pad)

    t = bcsr.data.shape[0]
    stream = not TILE_REVISIT
    out_spec1 = (pl.BlockSpec((1, tm, h), lambda i, br, bc: (i, 0, 0))
                 if stream else
                 pl.BlockSpec((tm, h), lambda i, br, bc: (br[i], 0)))
    out_shape1 = (jax.ShapeDtypeStruct((t, tm, h), jnp.float32)
                  if stream else
                  jax.ShapeDtypeStruct((bcsr.n_block_rows * tm, h), jnp.float32))
    grid1 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, tm, tk), lambda i, br, bc: (i, 0, 0)),
            pl.BlockSpec((h, tk), lambda i, br, bc: (0, bc[i])),
            pl.BlockSpec((tm, h), lambda i, br, bc: (br[i], 0)),
            pl.BlockSpec((tk, hf), lambda i, br, bc: (bc[i], 0)),
            pl.BlockSpec((tm, h), lambda i, br, bc: (br[i], 0)),
            pl.BlockSpec((tm, hf), lambda i, br, bc: (br[i], 0)),
            pl.BlockSpec((tm, h), lambda i, br, bc: (br[i], 0)),
        ],
        out_specs=out_spec1,
    )
    dldst = pl.pallas_call(
        functools.partial(_bwd_dldst_kernel, h, f, slope, stream),
        grid_spec=grid1,
        out_shape=out_shape1,
        cost_estimate=pl.CostEstimate(
            flops=t * h * tm * tk * (10 + 2 * f),
            bytes_accessed=(t * (tm * tk + tk * hf + 2 * tm * hf)) * 4,
            transcendentals=t * h * tm * tk,
        ),
        interpret=_interpret(),
    )(bcsr.block_rows, bcsr.block_cols, bcsr.data, lsrc_p.T, ldst_p, s2_p,
      m_p, dnum_p, dden_p)
    if stream:
        # ids restart at br[i]*tm per tile — block-sorted only, NOT sorted
        seg = (bcsr.block_rows[:, None] * tm
               + jax.lax.broadcasted_iota(jnp.int32, (t, tm), 1)).reshape(-1)
        dldst = jax.ops.segment_sum(
            dldst.reshape(t * tm, h), seg,
            num_segments=bcsr.n_block_rows * tm)
    dldst = dldst[:n]

    tt = bcsr_t.data.shape[0]
    tmt, tkt = bcsr_t.tm, bcsr_t.tk
    n_pad_t = bcsr_t.n_block_cols * tkt
    # transpose tiles share the node space; re-pad to the transpose grid
    lsrc_t = padded(lsrc, n_pad_t)
    ldst_t = padded(ldst, n_pad_t)
    s2_t = padded(s2, n_pad_t)
    m_t = padded(mx, n_pad_t)
    dnum_t = padded(dnum, n_pad_t)
    dden_t = padded(dden, n_pad_t)
    out_specs2 = ([
        pl.BlockSpec((1, tmt, hf), lambda i, br, bc: (i, 0, 0)),
        pl.BlockSpec((1, tmt, h), lambda i, br, bc: (i, 0, 0)),
    ] if stream else [
        pl.BlockSpec((tmt, hf), lambda i, br, bc: (br[i], 0)),
        pl.BlockSpec((tmt, h), lambda i, br, bc: (br[i], 0)),
    ])
    out_shapes2 = ([
        jax.ShapeDtypeStruct((tt, tmt, hf), jnp.float32),
        jax.ShapeDtypeStruct((tt, tmt, h), jnp.float32),
    ] if stream else [
        jax.ShapeDtypeStruct((bcsr_t.n_block_rows * tmt, hf), jnp.float32),
        jax.ShapeDtypeStruct((bcsr_t.n_block_rows * tmt, h), jnp.float32),
    ])
    grid2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tt,),
        in_specs=[
            pl.BlockSpec((1, tmt, tkt), lambda i, br, bc: (i, 0, 0)),
            pl.BlockSpec((tmt, h), lambda i, br, bc: (br[i], 0)),
            pl.BlockSpec((h, tkt), lambda i, br, bc: (0, bc[i])),
            pl.BlockSpec((tmt, hf), lambda i, br, bc: (br[i], 0)),
            pl.BlockSpec((h, tkt), lambda i, br, bc: (0, bc[i])),
            pl.BlockSpec((tkt, hf), lambda i, br, bc: (bc[i], 0)),
            pl.BlockSpec((h, tkt), lambda i, br, bc: (0, bc[i])),
        ],
        out_specs=out_specs2,
    )
    ds, dlsrc = pl.pallas_call(
        functools.partial(_bwd_sender_kernel, h, f, slope, stream),
        grid_spec=grid2,
        out_shape=out_shapes2,
        cost_estimate=pl.CostEstimate(
            flops=tt * h * tm * tk * (10 + 4 * f),
            bytes_accessed=(tt * (tm * tk + tk * hf + 3 * tm * hf)) * 4,
            transcendentals=tt * h * tm * tk,
        ),
        interpret=_interpret(),
    )(bcsr_t.block_rows, bcsr_t.block_cols, bcsr_t.data, lsrc_t, ldst_t.T,
      s2_t, m_t.T, dnum_t, dden_t.T)
    if stream:
        # ids restart at br[i]*tmt per tile — block-sorted only, NOT sorted
        seg_t = (bcsr_t.block_rows[:, None] * tmt
                 + jax.lax.broadcasted_iota(jnp.int32, (tt, tmt), 1)).reshape(-1)
        npad_rows = bcsr_t.n_block_rows * tmt
        ds = jax.ops.segment_sum(ds.reshape(tt * tmt, hf), seg_t,
                                 num_segments=npad_rows)
        dlsrc = jax.ops.segment_sum(dlsrc.reshape(tt * tmt, h), seg_t,
                                    num_segments=npad_rows)
    zeros = lambda e: jax.tree.map(jnp.zeros_like, e)
    return zeros(bcsr), zeros(bcsr_t), dlsrc[:n], dldst, ds[:n]


gat_tile_partials.defvjp(_tile_vjp_fwd, _tile_vjp_bwd)


# --------------------------------------------------------------------- #
# GATv2 tile attention (VERDICT r3 item 5)
# --------------------------------------------------------------------- #
#
# v2's logit is not separable: e_h(v,u) = sum_f a[h,f] * leaky(sl[u,hf+f]
# + sr[v,hf+f]) — an F-reduction per edge PAIR, where v1 only adds two
# node scalars. Inside a tile this is still dense VPU math on contiguous
# VMEM blocks: an F-loop of broadcast-add + leaky + scalar-fma builds the
# [tm, tk] logit block per head (h*f fused elementwise chains per tile),
# after which the flash accumulation/backward structure is identical to
# v1. The gradient wrt the attention vector ``a`` is accumulated as a
# per-receiver [tm, H*F] partial (da_part[v, hf] = sum_u de * leaky(pre));
# the tiny [H, F] reduction happens outside the kernel — scalar stores
# into a [H, F] output block are awkward in Mosaic, a full-lane partial
# is free next to dsr's traffic.


def _v2_logit(a_all, sr_block, slT_block, hh, f, slope):
    """[tm, tk] v2 logit block for head ``hh`` (F-loop of scalar FMAs)."""
    e = None
    for ff in range(f):
        idx = hh * f + ff
        pre = sr_block[:, idx : idx + 1] + slT_block[idx : idx + 1, :]
        term = a_all[hh, ff] * _leaky(pre, slope)
        e = term if e is None else e + term
    return e


def _v2_fwd_kernel(h, f, slope, br_ref, bc_ref, mask_ref, a_ref, slT_ref,
                   sr_ref, sagg_ref, num_ref, den_ref, max_ref):
    i = pl.program_id(0)
    prev = br_ref[jnp.maximum(i - 1, 0)]
    first_of_row = jnp.logical_or(i == 0, br_ref[i] != prev)

    @pl.when(first_of_row)
    def _():
        num_ref[...] = jnp.zeros_like(num_ref)
        den_ref[...] = jnp.zeros_like(den_ref)
        max_ref[...] = jnp.full_like(max_ref, NEG)

    mask = mask_ref[0] != 0  # [tm, tk]
    a_all = a_ref[...]
    slT = slT_ref[...]
    sr = sr_ref[...]
    for hh in range(h):
        e = _v2_logit(a_all, sr, slT, hh, f, slope)
        neg = jnp.where(mask, e, NEG)
        tmax = jnp.max(neg, axis=1, keepdims=True)  # [tm, 1]
        m_old = max_ref[:, hh : hh + 1]
        m_new = jnp.maximum(m_old, tmax)
        ex = jnp.where(mask, jnp.exp(neg - m_new), 0.0)
        corr = jnp.exp(m_old - m_new)
        den_ref[:, hh : hh + 1] = den_ref[:, hh : hh + 1] * corr + jnp.sum(
            ex, axis=1, keepdims=True
        )
        sl_h = sagg_ref[:, hh * f : (hh + 1) * f]  # [tk, F]
        num_ref[:, hh * f : (hh + 1) * f] = num_ref[
            :, hh * f : (hh + 1) * f
        ] * corr + jnp.dot(ex, sl_h, preferred_element_type=jnp.float32)
        max_ref[:, hh : hh + 1] = m_new


def _v2_bwd_recv_kernel(h, f, slope, br_ref, bc_ref, mask_ref, a_ref,
                        slT_ref, sr_ref, sagg_ref, m_ref, dnum_ref, dden_ref,
                        dsr_ref, dapart_ref):
    """Receiver-indexed v2 gradients over row-sorted forward tiles:
    dsr[v, hf] and the per-receiver da partial (summed outside)."""
    i = pl.program_id(0)
    prev = br_ref[jnp.maximum(i - 1, 0)]
    first_of_row = jnp.logical_or(i == 0, br_ref[i] != prev)

    @pl.when(first_of_row)
    def _():
        dsr_ref[...] = jnp.zeros_like(dsr_ref)
        dapart_ref[...] = jnp.zeros_like(dapart_ref)

    mask = mask_ref[0] != 0
    a_all = a_ref[...]
    slT = slT_ref[...]
    sr = sr_ref[...]
    for hh in range(h):
        e = _v2_logit(a_all, sr, slT, hh, f, slope)
        m = m_ref[:, hh : hh + 1]
        p = jnp.where(mask, jnp.exp(e - m), 0.0)  # [tm, tk]
        gdot = jax.lax.dot_general(
            dnum_ref[:, hh * f : (hh + 1) * f],  # [tm, F]
            sagg_ref[:, hh * f : (hh + 1) * f],  # [tk, F]
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        de = p * (gdot + dden_ref[:, hh : hh + 1])  # [tm, tk]
        for ff in range(f):
            idx = hh * f + ff
            pre = sr[:, idx : idx + 1] + slT[idx : idx + 1, :]
            leak = _leaky(pre, slope)
            grad_pre = de * (a_all[hh, ff] * jnp.where(pre >= 0, 1.0, slope))
            dsr_ref[:, idx : idx + 1] += jnp.sum(grad_pre, axis=1,
                                                 keepdims=True)
            dapart_ref[:, idx : idx + 1] += jnp.sum(de * leak, axis=1,
                                                    keepdims=True)


def _v2_bwd_send_kernel(h, f, slope, br_ref, bc_ref, mask_ref, a_ref,
                        sl_ref, srT_ref, mT_ref, dnum_ref, ddenT_ref,
                        dsl_ref):
    """Sender-indexed v2 gradients over TRANSPOSE tiles (rows u = senders,
    cols v = receivers): the aggregation term sum_v p_uv dnum_v plus the
    logit term through leaky'."""
    i = pl.program_id(0)
    prev = br_ref[jnp.maximum(i - 1, 0)]
    first_of_row = jnp.logical_or(i == 0, br_ref[i] != prev)

    @pl.when(first_of_row)
    def _():
        dsl_ref[...] = jnp.zeros_like(dsl_ref)

    mask = mask_ref[0] != 0  # [tm(u), tk(v)]
    a_all = a_ref[...]
    sl = sl_ref[...]
    srT = srT_ref[...]
    for hh in range(h):
        e = None
        for ff in range(f):
            idx = hh * f + ff
            pre = sl[:, idx : idx + 1] + srT[idx : idx + 1, :]
            term = a_all[hh, ff] * _leaky(pre, slope)
            e = term if e is None else e + term
        m = mT_ref[hh : hh + 1, :]  # [1, tk]
        p = jnp.where(mask, jnp.exp(e - m), 0.0)  # [tm, tk]
        dnum_h = dnum_ref[:, hh * f : (hh + 1) * f]  # [tk, F]
        # aggregation term: dsl_u += sum_v p_uv * dnum_v
        dsl_ref[:, hh * f : (hh + 1) * f] += jnp.dot(
            p, dnum_h, preferred_element_type=jnp.float32
        )
        gdot = jax.lax.dot_general(
            sl[:, hh * f : (hh + 1) * f],  # [tm, F]
            dnum_h,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        de = p * (gdot + ddenT_ref[hh : hh + 1, :])
        for ff in range(f):
            idx = hh * f + ff
            pre = sl[:, idx : idx + 1] + srT[idx : idx + 1, :]
            grad_pre = de * (a_all[hh, ff] * jnp.where(pre >= 0, 1.0, slope))
            dsl_ref[:, idx : idx + 1] += jnp.sum(grad_pre, axis=1,
                                                 keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def gatv2_tile_partials(meta, bcsr, bcsr_t, sl2, sr2, a):
    """Per-receiver GATv2 attention partials over the dense-tile edges.

    ``meta = (h, f, slope)``; ``sl2``/``sr2``: ``[N, H·F]`` source/receiver
    transforms (``sl2`` is also the aggregated feature, GATv2 semantics);
    ``a``: ``[H, F]`` attention vector. Returns ``(num [N, H·F],
    den [N, H], m [N, H])``; ``m`` non-differentiable (safe-softmax)."""
    return _v2_fwd_impl(meta, bcsr, sl2, sr2, a)


def _v2_fwd_impl(meta, bcsr, sl2, sr2, a):
    h, f, slope = meta
    n = sl2.shape[0]
    tm, tk = bcsr.tm, bcsr.tk
    hf = h * f
    n_pad = bcsr.n_block_cols * tk
    pad = n_pad - n

    def padded(x):
        return jnp.pad(x, ((0, pad), (0, 0))) if pad else x

    sl_p = padded(sl2)
    sr_p = padded(sr2)
    t = bcsr.data.shape[0]
    n_rows_pad = bcsr.n_block_rows * tm

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, tm, tk), lambda i, br, bc: (i, 0, 0)),
            pl.BlockSpec((h, f), lambda i, br, bc: (0, 0)),
            pl.BlockSpec((hf, tk), lambda i, br, bc: (0, bc[i])),
            pl.BlockSpec((tm, hf), lambda i, br, bc: (br[i], 0)),
            pl.BlockSpec((tk, hf), lambda i, br, bc: (bc[i], 0)),
        ],
        out_specs=[
            pl.BlockSpec((tm, hf), lambda i, br, bc: (br[i], 0)),
            pl.BlockSpec((tm, h), lambda i, br, bc: (br[i], 0)),
            pl.BlockSpec((tm, h), lambda i, br, bc: (br[i], 0)),
        ],
    )
    num, den, mx = pl.pallas_call(
        functools.partial(_v2_fwd_kernel, h, f, slope),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_rows_pad, hf), jnp.float32),
            jax.ShapeDtypeStruct((n_rows_pad, h), jnp.float32),
            jax.ShapeDtypeStruct((n_rows_pad, h), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=t * h * tm * tk * (4 * f + 8 + 2 * f),
            bytes_accessed=(t * (tm * tk + 2 * tk * hf + 2 * tm * hf)) * 4,
            transcendentals=2 * t * h * tm * tk,
        ),
        interpret=_interpret(),
    )(bcsr.block_rows, bcsr.block_cols, bcsr.data, a, sl_p.T, sr_p, sl_p)
    return num[:n], den[:n], mx[:n]


def _v2_vjp_fwd(meta, bcsr, bcsr_t, sl2, sr2, a):
    num, den, mx = _v2_fwd_impl(meta, bcsr, sl2, sr2, a)
    return (num, den, mx), (bcsr, bcsr_t, sl2, sr2, a, mx)


def _v2_vjp_bwd(meta, res, cts):
    h, f, slope = meta
    bcsr, bcsr_t, sl2, sr2, a, mx = res
    dnum, dden, _dm = cts
    n = sl2.shape[0]
    hf = h * f
    tm, tk = bcsr.tm, bcsr.tk
    if tm != tk or bcsr_t.tm != bcsr_t.tk:
        raise ValueError(
            "gatv2_tile_partials backward requires square tiles (tm == tk)"
        )

    def padded(x, rows):
        p = rows - x.shape[0]
        return jnp.pad(x, ((0, p), (0, 0))) if p else x

    n_pad = bcsr.n_block_cols * tk
    sl_p = padded(sl2, n_pad)
    sr_p = padded(sr2, n_pad)
    m_p = padded(mx, n_pad)
    dnum_p = padded(dnum, n_pad)
    dden_p = padded(dden, n_pad)
    t = bcsr.data.shape[0]
    n_rows_pad = bcsr.n_block_rows * tm

    grid1 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, tm, tk), lambda i, br, bc: (i, 0, 0)),
            pl.BlockSpec((h, f), lambda i, br, bc: (0, 0)),
            pl.BlockSpec((hf, tk), lambda i, br, bc: (0, bc[i])),
            pl.BlockSpec((tm, hf), lambda i, br, bc: (br[i], 0)),
            pl.BlockSpec((tk, hf), lambda i, br, bc: (bc[i], 0)),
            pl.BlockSpec((tm, h), lambda i, br, bc: (br[i], 0)),
            pl.BlockSpec((tm, hf), lambda i, br, bc: (br[i], 0)),
            pl.BlockSpec((tm, h), lambda i, br, bc: (br[i], 0)),
        ],
        out_specs=[
            pl.BlockSpec((tm, hf), lambda i, br, bc: (br[i], 0)),
            pl.BlockSpec((tm, hf), lambda i, br, bc: (br[i], 0)),
        ],
    )
    dsr, dapart = pl.pallas_call(
        functools.partial(_v2_bwd_recv_kernel, h, f, slope),
        grid_spec=grid1,
        out_shape=[
            jax.ShapeDtypeStruct((n_rows_pad, hf), jnp.float32),
            jax.ShapeDtypeStruct((n_rows_pad, hf), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=t * h * tm * tk * (8 * f + 10 + 2 * f),
            bytes_accessed=(t * (tm * tk + 2 * tk * hf + 4 * tm * hf)) * 4,
            transcendentals=t * h * tm * tk,
        ),
        interpret=_interpret(),
    )(bcsr.block_rows, bcsr.block_cols, bcsr.data, a, sl_p.T, sr_p, sl_p,
      m_p, dnum_p, dden_p)
    dsr = dsr[:n]
    da = dapart.sum(axis=0).reshape(h, f)

    tt = bcsr_t.data.shape[0]
    tmt, tkt = bcsr_t.tm, bcsr_t.tk
    n_pad_t = bcsr_t.n_block_cols * tkt
    sl_t = padded(sl2, n_pad_t)
    sr_t = padded(sr2, n_pad_t)
    m_t = padded(mx, n_pad_t)
    dnum_t = padded(dnum, n_pad_t)
    dden_t = padded(dden, n_pad_t)
    grid2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tt,),
        in_specs=[
            pl.BlockSpec((1, tmt, tkt), lambda i, br, bc: (i, 0, 0)),
            pl.BlockSpec((h, f), lambda i, br, bc: (0, 0)),
            pl.BlockSpec((tmt, hf), lambda i, br, bc: (br[i], 0)),
            pl.BlockSpec((hf, tkt), lambda i, br, bc: (0, bc[i])),
            pl.BlockSpec((h, tkt), lambda i, br, bc: (0, bc[i])),
            pl.BlockSpec((tkt, hf), lambda i, br, bc: (bc[i], 0)),
            pl.BlockSpec((h, tkt), lambda i, br, bc: (0, bc[i])),
        ],
        out_specs=pl.BlockSpec((tmt, hf), lambda i, br, bc: (br[i], 0)),
    )
    dsl = pl.pallas_call(
        functools.partial(_v2_bwd_send_kernel, h, f, slope),
        grid_spec=grid2,
        out_shape=jax.ShapeDtypeStruct((bcsr_t.n_block_rows * tmt, hf),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=tt * h * tmt * tkt * (8 * f + 10 + 4 * f),
            bytes_accessed=(tt * (tmt * tkt + 2 * tkt * hf + 3 * tmt * hf)) * 4,
            transcendentals=tt * h * tmt * tkt,
        ),
        interpret=_interpret(),
    )(bcsr_t.block_rows, bcsr_t.block_cols, bcsr_t.data, a, sl_t, sr_t.T,
      m_t.T, dnum_t, dden_t.T)
    dsl = dsl[:n]

    zeros = lambda e: jax.tree.map(jnp.zeros_like, e)
    return zeros(bcsr), zeros(bcsr_t), dsl, dsr, da


gatv2_tile_partials.defvjp(_v2_vjp_fwd, _v2_vjp_bwd)
