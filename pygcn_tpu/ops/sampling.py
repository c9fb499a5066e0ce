"""Layered neighborhood sampling (GraphSAGE-style) for graphs beyond HBM.

No reference counterpart (the reference trains full-batch only); mandated by
the BASELINE Reddit config ("exercises sampler + gather"). Design is
TPU-first:

- sampling itself is cheap host-side NumPy over CSR (it is data loading, and
  is fully overlappable with device compute);
- each sampled layer is a fixed-fanout **ELL block**: ``cols [m, K]`` indexes
  into the previous layer's node set, so device aggregation is a gather +
  weighted reduction along K — static shapes, contiguous output, **no
  scatter** on the device;
- weights support mean aggregation or unbiased GCN-normalized aggregation
  (``A_hat``-weighted with degree/fanout importance scaling), so a sampled
  step estimates the same propagation the full-batch GCN computes.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


@dataclasses.dataclass(frozen=True)
class SampledBlock:
    """One message-passing layer's sampled neighborhood."""

    cols: jax.Array  # [m, K] indices into the previous layer's nodes
    weights: jax.Array  # [m, K] aggregation weights (0 for padding)
    self_idx: jax.Array  # [m] index of each output node inside the input set


jax.tree_util.register_dataclass(
    SampledBlock, data_fields=["cols", "weights", "self_idx"], meta_fields=[]
)


@dataclasses.dataclass(frozen=True)
class SampledBatch:
    blocks: List[SampledBlock]  # innermost layer first
    input_nodes: np.ndarray  # global ids feeding layer 0
    output_nodes: np.ndarray  # global ids of the final layer (the seeds)
    # pre-pad input_nodes length per shard ([G], stacked batches only):
    # lets the feature-fetch planner skip pow2-pad entries
    n_input_valid: "np.ndarray | None" = None


def aggregate_block(block: SampledBlock, h: jax.Array) -> jax.Array:
    """[n_in, F] → [m, F]: weighted reduction over the K sampled neighbors."""
    gathered = jnp.take(h, block.cols.reshape(-1), axis=0).reshape(
        block.cols.shape + (h.shape[1],)
    )
    return (gathered * block.weights[..., None]).sum(axis=1)


def _pow2_pad_len(n: int) -> int:
    """Next power of two ≥ n (≥ 1); bounds the number of distinct jit shapes."""
    return 1 << max(int(n) - 1, 0).bit_length()


class NeighborSampler:
    """Uniform fixed-fanout sampler over a CSR adjacency.

    ``mode='mean'`` averages sampled neighbors (SAGE-mean);
    ``mode='gcn'`` uses the normalized edge weights scaled by ``deg/K`` so the
    sampled sum is an unbiased estimator of the full ``A_hat @ h`` row.
    """

    def __init__(
        self,
        adj: sp.spmatrix,
        fanouts: Sequence[int],
        mode: str = "gcn",
        seed: int = 0,
    ):
        csr = adj.tocsr()
        self.indptr = csr.indptr.astype(np.int64, copy=False)
        self.indices = csr.indices.astype(np.int64, copy=False)
        self.data = csr.data.astype(np.float32)
        self.n = csr.shape[0]
        self.fanouts = list(fanouts)
        self.mode = mode
        self.seed = int(seed)
        self._n_draws = 0  # per-layer-call counter; see _sample_layer
        # dense rank table for the native bounded unique/relabel kernel;
        # allocated lazily, reused (and re-zeroed) across sample() calls
        self._uniq_scratch: np.ndarray | None = None

    def _sample_layer(self, out_nodes: np.ndarray, k: int, draw: int):
        # Counter-based splitmix64 draws (pick (i,j) = mix64(base + i*k + j)
        # % deg): deterministic in (seed, draw counter), bit-identical between
        # the fused native kernel and the NumPy fallback, and GIL-releasing
        # when native, so prefetch-threaded sampling truly overlaps.
        from pygcn_tpu.utils.native import _mix64, sample_layer

        # hash the FULL 64-bit seed before mixing in the draw counter, so
        # seeds differing only in high bits get distinct streams and the
        # counter cannot alias the seed field
        base = _mix64(_mix64(self.seed & (2**64 - 1)) ^ draw)
        return sample_layer(
            self.indptr, self.indices, self.data, out_nodes, k, base,
            mode=self.mode,
        )

    def make_scratch(self) -> "np.ndarray | None":
        """Allocate a dedup scratch table for concurrent ``sample_np`` calls."""
        from pygcn_tpu.utils.native import available

        return np.zeros(self.n, np.int32) if available() else None

    def sample(self, seeds: np.ndarray, pad: bool = False) -> SampledBatch:
        """Sample a layered minibatch.

        ``pad=True`` rounds every dynamic dimension (the per-layer deduped
        node-set sizes) up to the next power of two, so batch pytrees take
        only O(log) distinct shapes — without it every minibatch has a fresh
        ``input_nodes`` count and a jitted train step recompiles *per batch*
        on TPU. Padding is appended after sampling (node id 0, zero weights),
        so the sampled values on real rows are identical to ``pad=False``.
        """
        blocks_np, input_nodes, _ = self.sample_np(seeds, pad=pad)
        blocks = [
            SampledBlock(
                cols=jnp.asarray(cols_local),
                weights=jnp.asarray(weights),
                self_idx=jnp.asarray(self_idx),
            )
            for cols_local, weights, self_idx in blocks_np
        ]
        return SampledBatch(
            blocks=blocks, input_nodes=input_nodes,
            output_nodes=np.asarray(seeds, np.int64),
        )

    def sample_np(self, seeds: np.ndarray, pad: bool = False,
                  draw_base: "int | None" = None, scratch=None):
        """Host-side core of :meth:`sample`.

        Returns ``(blocks, input_nodes, n_in_valid)`` where ``blocks`` is an
        innermost-first list of ``(cols[m,K] int32, weights[m,K] f32,
        self_idx[m] int32)`` NumPy triples and ``n_in_valid`` is the PRE-pad
        ``input_nodes`` length (== ``input_nodes.size`` when ``pad=False``;
        the feature-fetch planner uses it to skip pad entries). Kept NumPy
        so multi-shard callers (``parallel/dp_sampled.py``) can re-pad and
        stack shard batches before a single device transfer.

        Each call consumes ``len(fanouts)`` RNG draw counters. By default
        they come off the sampler's sequential stream; concurrent callers
        pass an explicit ``draw_base`` (plus their own ``scratch`` from
        :meth:`make_scratch`) to get bit-identical results in any execution
        order — the sampler's own counter is then left untouched.
        """
        from pygcn_tpu.utils.native import available, unique_inverse

        sequential = draw_base is None
        if sequential:
            draw_base = self._n_draws
            self._n_draws += len(self.fanouts)
        if scratch is None:
            if self._uniq_scratch is None and available():
                self._uniq_scratch = np.zeros(self.n, np.int32)
            if not sequential and self._uniq_scratch is not None:
                raise ValueError(
                    "concurrent sample_np calls must pass their own scratch "
                    "(make_scratch()) — the shared table is not thread-safe"
                )
            scratch = self._uniq_scratch
        seeds = np.asarray(seeds, np.int64)
        blocks_meta = []
        out_nodes = seeds
        # build from the outermost (last) layer inward
        for li, k in enumerate(reversed(self.fanouts)):
            cols_global, weights = self._sample_layer(
                out_nodes, k, draw_base + li
            )
            need = np.concatenate([out_nodes, cols_global.reshape(-1)])
            in_nodes, inverse = unique_inverse(need, self.n, scratch)
            self_idx = inverse[: out_nodes.size]
            cols_local = inverse[out_nodes.size :].reshape(cols_global.shape)
            blocks_meta.append((cols_local, weights, self_idx, out_nodes))
            out_nodes = in_nodes

        n_in_valid = out_nodes.size
        if pad:
            # Pad each inner node set (and the block arrays shaped by it) to
            # the next power of two. Padded block rows gather node-set entry 0
            # with zero weight; their outputs are never referenced because
            # real cols only index real entries.
            in_nodes_pad = _pow2_pad_len(out_nodes.size)
            out_nodes = np.concatenate(
                [out_nodes, np.zeros(in_nodes_pad - out_nodes.size, np.int64)]
            )
            padded_meta = []
            # blocks_meta is outermost-first; the outermost m (= seeds) stays
            for depth, (cols_local, weights, self_idx, onodes) in enumerate(
                blocks_meta
            ):
                m = cols_local.shape[0]
                m_pad = m if depth == 0 else _pow2_pad_len(m)
                cols_local = np.concatenate(
                    [cols_local, np.zeros((m_pad - m,) + cols_local.shape[1:], cols_local.dtype)]
                )
                weights = np.concatenate(
                    [weights, np.zeros((m_pad - m,) + weights.shape[1:], weights.dtype)]
                )
                self_idx = np.concatenate(
                    [self_idx, np.zeros(m_pad - m, self_idx.dtype)]
                )
                padded_meta.append((cols_local, weights, self_idx, onodes))
            blocks_meta = padded_meta

        blocks = [
            (cols_local.astype(np.int32), weights.astype(np.float32),
             self_idx.astype(np.int32))
            for cols_local, weights, self_idx, _ in reversed(blocks_meta)
        ]
        return blocks, out_nodes, n_in_valid


def iter_sampled_batches(
    sampler: "NeighborSampler",
    seed_batches,
    prefetch: int = 2,
    pad: bool = False,
    sample_fn=None,
):
    """Yield ``(seeds, SampledBatch)`` with host sampling overlapped.

    A single producer thread runs ``sampler.sample`` up to ``prefetch``
    minibatches ahead of the consumer, so CPU-side sampling (RNG picks, CSR
    gathers, dedup/relabel — see ``NeighborSampler.sample``) hides under the
    device step instead of serializing with it. One producer keeps the
    sampler's RNG stream identical to the serial loop; the native
    ``gk_unique_inverse`` ctypes call releases the GIL, so the overlap is
    real. ``prefetch=0`` degrades to the serial loop. ``sample_fn`` overrides
    how a seed batch becomes a device batch (default ``sampler.sample``; the
    data-parallel path passes a shard-group sampler here).
    """
    if sample_fn is None:
        sample_fn = lambda seeds: sampler.sample(seeds, pad=pad)
    seed_batches = list(seed_batches)
    if prefetch <= 0:
        for seeds in seed_batches:
            yield seeds, sample_fn(seeds)
        return

    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    _END = object()
    stop = threading.Event()

    def _produce():
        try:
            for seeds in seed_batches:
                if stop.is_set():
                    return
                q.put((seeds, sample_fn(seeds)))
        except BaseException as e:  # propagate into the consumer
            q.put(e)
            return
        q.put(_END)

    t = threading.Thread(target=_produce, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # early consumer exit: tell the producer to stop (it checks between
        # batches, so this blocks at most one sample() call) and unblock any
        # q.put it is sitting in
        stop.set()
        while t.is_alive():
            try:
                q.get_nowait()
            except queue.Empty:
                t.join(timeout=0.05)


def sampled_gcn_forward(params_list, batch: SampledBatch, x_input: jax.Array,
                        activation=jax.nn.relu, final_activation=None):
    """Apply a stack of GCN layers over sampled blocks.

    ``params_list``: per-layer dicts with ``w`` [F_in, F_out] and optional
    ``b``; layer L consumes block L. The math per layer matches
    ``GraphConv`` (``A_hat``-weighted aggregation of ``x @ W``).
    """
    h = x_input
    n_layers = len(params_list)
    for i, (p, block) in enumerate(zip(params_list, batch.blocks)):
        support = jnp.dot(h, p["w"])
        h = aggregate_block(block, support)
        if "b" in p:
            h = h + p["b"]
        act = activation if i < n_layers - 1 else final_activation
        if act is not None:
            h = act(h)
    return h


def sampled_gatv2_forward(
    params_list,
    batch: SampledBatch,
    x_input: jax.Array,
    negative_slope: float = 0.2,
    final_activation=None,
):
    """GATv2 over sampled neighborhoods (dynamic-attention counterpart of
    :func:`sampled_gat_forward`; same masking/stacking conventions).

    Per-layer params: ``w_l`` [F_in, H*F'] (source transform — also the
    aggregated message), optional ``w_r`` (receiver transform; defaults to
    tied ``w_l``), ``a`` [H, F'] and optional ``b``. The v2 logit
    ``a · leaky_relu(s_l[u] + s_r[v])`` is computed slot-wise inside each
    fixed-fanout block — a [m, K, H·F'] transient, reduced against ``a``
    immediately.
    """
    h = x_input
    n_layers = len(params_list)
    for i, (p, block) in enumerate(zip(params_list, batch.blocks)):
        heads, fo = p["a"].shape
        hf = heads * fo
        m, k = block.cols.shape
        s_l = jnp.dot(h, p["w_l"])  # [n_in, H*F']
        s_r = jnp.dot(h, p.get("w_r", p["w_l"]))
        g = jnp.take(s_l, block.cols.reshape(-1), axis=0).reshape(m, k, hf)
        d = jnp.take(s_r, block.self_idx, axis=0).reshape(m, 1, hf)
        pre = jax.nn.leaky_relu(g + d, negative_slope)  # [m, k, H*F']
        # f-replicated per-head logits in ONE full-lane MXU product:
        # (pre ∘ a_flat) @ blockdiag(1_{f×f}) puts Σ_f pre·a of head h in
        # every lane of head h — no [m,k,H] or [m,k,H,F] narrow/4-D tensor
        # (the 16x lane-padding trap, ops/gat.py round-2 profile)
        ones_bd = jnp.kron(jnp.eye(heads, dtype=pre.dtype),
                           jnp.ones((fo, fo), pre.dtype))
        e = jnp.dot(pre * p["a"].reshape(-1), ones_bd,
                    preferred_element_type=pre.dtype)  # [m, k, H*F'] f-rep
        valid = (block.weights > 0)[..., None]  # [m, k, 1]
        e = jnp.where(valid, e, -jnp.inf)
        emax = e.max(axis=1, keepdims=True)
        emax = jnp.where(jnp.isfinite(emax), emax, 0.0)
        ex = jnp.exp(e - emax) * valid
        denom = jnp.maximum(ex.sum(axis=1, keepdims=True), 1e-16)
        alpha = ex / denom  # [m, k, H*F'] f-replicated
        out = (g * alpha).sum(axis=1)  # [m, H*F'] — full-lane throughout
        # isolated nodes (no valid neighbors) keep their own transform
        own = jnp.take(s_l, block.self_idx, axis=0)
        has = valid.any(axis=1)  # [m, 1]
        out = jnp.where(has, out, own)
        if i < n_layers - 1:
            h = out
            if "b" in p:
                h = h + p["b"]
            h = jax.nn.elu(h)
        else:
            h = out.reshape(m, heads, fo).mean(axis=1)
            if "b" in p:
                h = h + p["b"]
            if final_activation is not None:
                h = final_activation(h)
    return h


def sampled_gat_forward(
    params_list,
    batch: SampledBatch,
    x_input: jax.Array,
    negative_slope: float = 0.2,
    final_activation=None,
):
    """GAT over sampled neighborhoods: attention within each fixed-fanout block.

    The minibatch counterpart of ``ops/gat.py`` (full-batch) — per output
    node, the softmax runs over its K sampled neighbors (axis reduction, no
    segment ops at all; the fixed fanout makes attention embarrassingly
    regular on TPU). ``params_list``: per-layer dicts with ``w`` [F_in, H*F'],
    ``a_src``/``a_dst`` [H, F'] and optional ``b``; multi-head concat on all
    but the last layer, head-mean on the last (the standard GAT stacking),
    ELU between layers. Sampled-with-replacement duplicates each count as
    their own attention slot (same estimator flavour as the SAGE-mean path).
    Zero-weight slots (padding / isolated nodes) are masked out of the
    softmax; isolated nodes fall back to attending their own representation.
    """
    h = x_input
    n_layers = len(params_list)
    for i, (p, block) in enumerate(zip(params_list, batch.blocks)):
        heads, fo = p["a_src"].shape
        hf = heads * fo
        m, k = block.cols.shape
        s2 = jnp.dot(h, p["w"])  # [n_in, H*F']
        s3 = s2.reshape(h.shape[0], heads, fo)
        # f-replicated node logits (tiny [n_in, H*F'] tensors) so every
        # per-slot tensor below is full-lane — the round-2 64-lane lesson
        # (ops/gat.py: gat_conv_ell_onepass); previously the [m, K, H] and
        # [m, K, H, F'] intermediates paid 16x lane padding at H=8
        rep = lambda t: jnp.repeat(t, fo, axis=-1)
        lsrc = rep(jnp.einsum("nhf,hf->nh", s3, p["a_src"]))
        ldst = rep(jnp.einsum("nhf,hf->nh", s3, p["a_dst"]))
        # per-slot logits: neighbors' source logits + the output node's own
        # destination logit (the node itself sits at block.self_idx)
        e = jax.nn.leaky_relu(
            jnp.take(lsrc, block.cols.reshape(-1), axis=0).reshape(m, k, hf)
            + jnp.take(ldst, block.self_idx, axis=0)[:, None, :],
            negative_slope,
        )
        valid = (block.weights > 0)[..., None]  # [m, k, 1]
        e = jnp.where(valid, e, -jnp.inf)
        emax = e.max(axis=1, keepdims=True)
        emax = jnp.where(jnp.isfinite(emax), emax, 0.0)
        ex = jnp.exp(e - emax) * valid
        denom = jnp.maximum(ex.sum(axis=1, keepdims=True), 1e-16)
        alpha = ex / denom  # [m, k, H*F'] f-replicated; no-valid rows -> 0
        g = jnp.take(s2, block.cols.reshape(-1), axis=0).reshape(m, k, hf)
        out = (g * alpha).sum(axis=1)  # [m, H*F'] — full-lane throughout
        # isolated nodes (no valid neighbors) keep their own transform
        own = jnp.take(s2, block.self_idx, axis=0)
        has = valid.any(axis=1)  # [m, 1]
        out = jnp.where(has, out, own)
        if i < n_layers - 1:
            h = out
            if "b" in p:
                h = h + p["b"]
            h = jax.nn.elu(h)
        else:
            h = out.reshape(m, heads, fo).mean(axis=1)
            if "b" in p:
                h = h + p["b"]
            if final_activation is not None:
                h = final_activation(h)
    return h
