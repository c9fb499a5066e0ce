"""Pallas TPU block-sparse SpMM.

``y = A @ x`` where ``A`` is stored as nonzero ``tm×tk`` tiles (:class:`BCSR`).
Each grid step multiplies one adjacency tile against one ``tk×TN`` slab of the
feature matrix on the MXU and accumulates into the output block for that tile's
block row. Tiles are sorted by block row, so consecutive grid steps that share a
block row keep the output block resident in VMEM (the classic Pallas
"revisiting output" accumulation pattern); the tile's block-row/col coordinates
are scalar-prefetched so the BlockSpec index maps can route DMA before the body
runs.

This is the TPU-native replacement for the reference's single sparse op,
``torch.spmm`` (reference ``pygcn/layers.py:34``): instead of a CUDA CSR kernel,
the sparsity is expressed as an MXU-tile schedule.

Backward: ``dx = A^T @ dy`` runs the same kernel over prebuilt transpose tiles
(``Graph.bcsr_t``; symmetric graphs reuse the forward tiles). The cotangent for
the adjacency itself is structurally zero (adjacencies are data, not params) —
returned as zeros and dead-code-eliminated by XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pygcn_tpu.graph.graph import BCSR, Graph

TN = 128  # feature-dimension tile (lane width)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# A/B flag: emit per-tile product blocks merged by an XLA segment_sum
# instead of read-modify-write accumulation into per-block-row outputs.
# MEASURED (r3): streaming LOSES in both regimes — arxiv clustered hybrid
# 556M -> 407M edges/s (clean sessions), products tiles 788 -> 2620 ms —
# the [T·tm, H] intermediate + merge costs more than the revisit stalls.
# The revisit pattern stays the default; the products-scale 41 us/tile
# cost is dominated by something other than output RMW (open lever).
BCSR_STREAM = False


def _kernel(br_ref, bc_ref, data_ref, x_ref, out_ref):
    i = pl.program_id(1)
    prev = br_ref[jnp.maximum(i - 1, 0)]
    first_of_row = jnp.logical_or(i == 0, br_ref[i] != prev)

    @pl.when(first_of_row)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += jnp.dot(
        data_ref[0], x_ref[...], preferred_element_type=out_ref.dtype
    )


def _kernel_stream(br_ref, bc_ref, data_ref, x_ref, out_ref):
    out_ref[0] = jnp.dot(
        data_ref[0], x_ref[...], preferred_element_type=out_ref.dtype
    )


@functools.partial(jax.jit, static_argnames=("n_rows", "out_dtype"))
def bcsr_spmm(bcsr: BCSR, x: jax.Array, *, n_rows: int, out_dtype=None) -> jax.Array:
    """``A @ x`` with ``A`` in BCSR tiles. ``x``: [n_cols, H] → [n_rows, H].

    ``data``/``x`` may be bf16 (halving the kernel's HBM read traffic —
    tile storage dominates the working set at products scale) while the
    output/accumulator stays f32 via ``out_dtype``: the MXU multiplies
    bf16 natively with an f32 accumulator, so precision loss is only the
    input rounding. ``out_dtype`` defaults to ``x.dtype``.
    """
    tm, tk = bcsr.tm, bcsr.tk
    t = bcsr.data.shape[0]
    h = x.shape[1]
    hn = -(-h // TN)
    if bcsr.data.dtype == jnp.bfloat16 and x.dtype == jnp.float32:
        # bf16-stored tiles (the measured products-scale layout: 13x over
        # f32, PERF_NOTES r4): run the MXU in its native bf16 mode with an
        # f32 accumulator — cast x down, keep the output f32.
        if out_dtype is None:
            out_dtype = jnp.float32
        x = x.astype(jnp.bfloat16)
    if out_dtype is None:
        out_dtype = x.dtype

    x_pad_rows = bcsr.n_block_cols * tk - x.shape[0]
    x_pad_cols = hn * TN - h
    if x_pad_rows or x_pad_cols:
        x = jnp.pad(x, ((0, x_pad_rows), (0, x_pad_cols)))

    if BCSR_STREAM:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(hn, t),
            in_specs=[
                pl.BlockSpec((1, tm, tk), lambda j, i, br, bc: (i, 0, 0)),
                pl.BlockSpec((tk, TN), lambda j, i, br, bc: (bc[i], j)),
            ],
            out_specs=pl.BlockSpec((1, tm, TN), lambda j, i, br, bc: (i, 0, j)),
        )
        parts = pl.pallas_call(
            _kernel_stream,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((t, tm, hn * TN), out_dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * t * tm * tk * hn * TN,
                bytes_accessed=(t * tm * tk + t * tk * TN + t * tm * hn * TN) * 4,
                transcendentals=0,
            ),
            interpret=_interpret(),
        )(bcsr.block_rows, bcsr.block_cols, bcsr.data, x)
        # Segment ids are only BLOCK-sorted: every tile of a block row
        # restarts its id run at r*tm, so the flattened sequence is unsorted
        # whenever a block row owns >1 tile (the common case). Claiming
        # sortedness here is undefined behavior on TPU (CPU interpret
        # ignores the hint, so parity tests can't catch it).
        seg = (bcsr.block_rows[:, None] * tm
               + jax.lax.broadcasted_iota(jnp.int32, (t, tm), 1)).reshape(-1)
        out = jax.ops.segment_sum(
            parts.reshape(t * tm, hn * TN), seg,
            num_segments=bcsr.n_block_rows * tm,
        )
        return out[:n_rows, :h]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # block_rows, block_cols
        grid=(hn, t),
        in_specs=[
            pl.BlockSpec((1, tm, tk), lambda j, i, br, bc: (i, 0, 0)),
            pl.BlockSpec((tk, TN), lambda j, i, br, bc: (bc[i], j)),
        ],
        out_specs=pl.BlockSpec((tm, TN), lambda j, i, br, bc: (br[i], j)),
    )

    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bcsr.n_block_rows * tm, hn * TN), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * tm * tk * hn * TN,
            bytes_accessed=(t * tm * tk + t * tk * TN + bcsr.n_block_rows * tm * hn * TN) * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(bcsr.block_rows, bcsr.block_cols, bcsr.data, x)

    return out[:n_rows, :h]


@jax.custom_vjp
def bcsr_spmm_vjp(graph: Graph, x: jax.Array) -> jax.Array:
    return bcsr_spmm(graph.bcsr, x, n_rows=graph.n_nodes)


def _fwd(graph: Graph, x: jax.Array):
    return bcsr_spmm_vjp(graph, x), graph


def _bwd(graph: Graph, g: jax.Array):
    bt = graph.bcsr if graph.is_symmetric else graph.bcsr_t
    dx = bcsr_spmm(bt, g, n_rows=graph.n_nodes)
    dgraph = jax.tree.map(jnp.zeros_like, graph)
    return dgraph, dx


bcsr_spmm_vjp.defvjp(_fwd, _bwd)
