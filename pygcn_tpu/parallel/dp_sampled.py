"""Data-parallel neighborhood-sampled training over a device mesh.

No reference counterpart (the reference is single-device, full-batch;
``pygcn/train.py:30`` pins one GPU). This is the scale-out mode for the
sampled path (``ops/sampling.py``): the global seed batch is split over the
mesh ``data`` axis, each shard samples its own fixed-fanout neighborhood
host-side, and one jitted step runs every shard's forward/backward in SPMD
with a single gradient ``pmean`` over ICI.

TPU-first design choices:

- **Stacked static shapes.** Each shard's sampled batch is pow2-padded
  (``NeighborSampler.sample_np(pad=True)``) and then re-padded to the group
  max per layer, so the stacked pytree (leading axis = shard) keeps the
  O(log) distinct-shape property — the step compiles a handful of times,
  never per minibatch.
- **One transfer, no host loop.** All shards' blocks are stacked host-side
  (NumPy) and cross host→device as one sharded pytree; devices never wait on
  per-shard Python dispatch.
- **Features stay resident.** ``x_full`` is replicated on device; only seed
  indices and block metadata move per step, exactly like the single-device
  sampled path. When the feature matrix is too big to replicate,
  ``feature_sharded=True`` keeps it row-sharded over the same mesh axis and
  each step fetches its input rows with one ``all_to_all`` planned host-side
  (:func:`build_fetch_plan`) — every row moves exactly once over ICI.
- **Gradient exchange is a single ``pmean``** over the ``data`` axis inside
  ``shard_map`` — the XLA all-reduce rides ICI; the optimizer update runs
  replicated (identical on every shard after the reduce).
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pygcn_tpu.ops.sampling import (
    NeighborSampler,
    SampledBatch,
    SampledBlock,
    _pow2_pad_len as _pow2,
)


def stack_shard_batches(
    shard_samples: Sequence[Tuple[list, np.ndarray]],
) -> Tuple[List[SampledBlock], np.ndarray]:
    """Stack G host-side sampled batches into one leading-shard-axis pytree.

    ``shard_samples``: per-shard ``NeighborSampler.sample_np(seeds, pad=True)``
    results — innermost-first ``(cols[m,K], weights[m,K], self_idx[m])``
    triples plus the deduped ``input_nodes``. Per-layer dims are re-padded to
    the group max (max of powers of two is a power of two, so the O(log)
    distinct-shape property survives stacking). Padding rows replicate the
    single-shard convention: node-set entry 0 with zero weight, never
    referenced by real rows.

    Returns ``(blocks, input_nodes, n_valid)`` where each ``SampledBlock``
    field has a leading shard axis (``cols [G,m,K]``, ``weights [G,m,K]``,
    ``self_idx [G,m]``), ``input_nodes`` is ``[G, n_in]`` int32, and
    ``n_valid [G]`` holds each shard's pre-pad input length.
    """
    n_layers = len(shard_samples[0][0])
    blocks: List[SampledBlock] = []
    for d in range(n_layers):
        m_pad = max(s[0][d][0].shape[0] for s in shard_samples)
        cols = np.stack([
            _pad_rows(s[0][d][0], m_pad) for s in shard_samples
        ])
        weights = np.stack([
            _pad_rows(s[0][d][1], m_pad) for s in shard_samples
        ])
        self_idx = np.stack([
            _pad_rows(s[0][d][2], m_pad) for s in shard_samples
        ])
        blocks.append(
            SampledBlock(
                cols=jnp.asarray(cols),
                weights=jnp.asarray(weights),
                self_idx=jnp.asarray(self_idx),
            )
        )
    n_in_pad = max(s[1].size for s in shard_samples)
    input_nodes = np.stack([
        _pad_rows(s[1].astype(np.int32), n_in_pad) for s in shard_samples
    ])
    # PRE-pad dedup sizes (sample_np pads input_nodes itself, so s[1].size
    # would overcount): what lets the fetch planner skip every pad entry
    n_valid = np.asarray([s[2] for s in shard_samples], np.int64)
    return blocks, input_nodes, n_valid


def _pad_rows(a: np.ndarray, m: int) -> np.ndarray:
    if a.shape[0] == m:
        return a
    pad = np.zeros((m - a.shape[0],) + a.shape[1:], a.dtype)
    return np.concatenate([a, pad])


class ShardedNeighborSampler:
    """Drop-in ``sample_fn`` for ``iter_sampled_batches`` over G shards.

    Splits each global seed batch into ``n_shards`` equal slices, samples each
    with the wrapped single-graph sampler, and stacks the results. The global
    batch size must be divisible by ``n_shards``.

    ``workers > 1`` samples the shards on a thread pool: the RNG is
    counter-based, so per-shard draw counters are pre-assigned (shard ``g`` of
    group call ``c`` gets counters ``(c*G + g) * n_layers ...``) — exactly the
    counters the sequential loop would consume — and each worker slot owns its
    dedup scratch table, making the threaded result **bit-identical** to
    ``workers=0`` in any completion order. The native sampling/dedup kernels
    release the GIL, so the speedup is real — but only once per-shard batches
    are large enough to amortize pool dispatch and the GIL-held NumPy
    glue (measured on this host: 4096-seed shards 50→35 ms/group, 1.4x;
    512-seed shards regress 10→19 ms). Default stays serial.

    ``align_shard_size``: route each seed to the shard OWNING its feature
    rows (owner = ``seed // align_shard_size``, the row-sharded store layout
    of :func:`shard_feature_rows`) instead of splitting the batch in order.
    Any seed→shard assignment yields the SAME global gradient (the loss is a
    mean over the global batch and grads are ``pmean``-reduced), so this is a
    pure communication optimization: on a locality-ordered graph most
    sampled neighbors share the seed's shard and the feature all_to_all
    collapses (see :func:`build_fetch_plan`). Seeds are owner-sorted and
    split into equal contiguous chunks — shards whose seeds overflow their
    chunk spill into the neighboring shard, keeping shapes static.
    """

    def __init__(self, sampler: NeighborSampler, n_shards: int,
                 workers: int = 0, align_shard_size: "int | None" = None):
        self.sampler = sampler
        self.n_shards = int(n_shards)
        self.align_shard_size = align_shard_size
        self._pool = None
        if workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(
                min(workers, self.n_shards),
                thread_name_prefix="shard-sampler",
            )
            self._scratches = [
                sampler.make_scratch() for _ in range(self.n_shards)
            ]

    def __call__(self, seeds: np.ndarray):
        seeds = np.asarray(seeds, np.int64)
        if seeds.size % self.n_shards:
            raise ValueError(
                f"global batch {seeds.size} not divisible by "
                f"{self.n_shards} shards"
            )
        if self.align_shard_size is not None:
            owner = np.minimum(
                seeds // self.align_shard_size, self.n_shards - 1
            )
            seeds = seeds[np.argsort(owner, kind="stable")]
        shard_seeds = seeds.reshape(self.n_shards, -1)
        if self._pool is None:
            samples = [
                self.sampler.sample_np(s, pad=True) for s in shard_seeds
            ]
        else:
            n_layers = len(self.sampler.fanouts)
            base = self.sampler._n_draws
            self.sampler._n_draws = base + self.n_shards * n_layers
            samples = list(
                self._pool.map(
                    lambda gs: self.sampler.sample_np(
                        gs[1], pad=True, draw_base=base + gs[0] * n_layers,
                        scratch=self._scratches[gs[0]],
                    ),
                    enumerate(shard_seeds),
                )
            )
        blocks, input_nodes, n_valid = stack_shard_batches(samples)
        return SampledBatch(
            blocks=blocks, input_nodes=input_nodes, output_nodes=shard_seeds,
            n_input_valid=n_valid,
        )


def build_fetch_plan(
    input_nodes: np.ndarray,
    shard_size: int,
    n_valid: "np.ndarray | None" = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side routing plan for a ROW-SHARDED feature store.

    When node features are too large to replicate (the Reddit/products-scale
    regime), ``x`` lives row-sharded over the same mesh axis as the DP
    shards: device ``o`` owns rows ``[o*S, (o+1)*S)``. Each sampled batch
    then needs a cross-shard gather, planned here while the batch is still
    on the host (sampling already knows every index):

    - ``req_idx [G_owner, G_requester, K]``: the local row ids each owner
      must send to each OTHER requester (the requester==owner diagonal is
      excluded — those rows never leave the device). K = group-max remote
      list length rounded to a power of two — O(log) distinct shapes, same
      trick as the batch pads;
    - ``loc_idx [G, L]``: each requester's OWN rows, gathered locally with
      no communication (L = pow2 group max);
    - ``inv_perm [G, n_in]``: where each of a requester's ``input_nodes``
      lands in ``concat(received [G*K], local [L])``, restoring sampling
      order.

    On device the remote gather is ONE ``all_to_all`` of ``[G, K, F]``
    blocks per step — every remote row moves exactly once over ICI; local
    rows cost nothing. With owner-aligned seed sharding
    (:class:`ShardedNeighborSampler` ``align_shard_size``) on a
    locality-ordered graph, most rows are local and K collapses.

    ``n_valid [G]``: pre-pad ``input_nodes`` lengths
    (``SampledBatch.n_input_valid``). Entries past it are pow2 padding —
    never referenced by block rows — and are routed to local slot 0 instead
    of being fetched (without this they all count as owned by shard 0 and
    inflate K).
    """
    input_nodes = np.asarray(input_nodes)
    G, n_in = input_nodes.shape
    owner = input_nodes // shard_size
    local = (input_nodes % shard_size).astype(np.int32)
    if owner.max() >= G:
        raise ValueError(
            f"node id {input_nodes.max()} outside {G} shards x {shard_size}"
        )
    if n_valid is not None:
        # sentinel owner G sorts last and is excluded from every count
        pad = np.arange(n_in)[None, :] >= np.asarray(n_valid)[:, None]
        owner = np.where(pad, G, owner)
    # group each requester's indices by owner with one stable argsort —
    # O(G n log n) host work, no per-(owner, requester) pair scan
    order = np.argsort(owner, axis=1, kind="stable")
    sorted_owner = np.take_along_axis(owner, order, axis=1)
    counts = np.zeros((G, G + 1), np.int64)
    for g in range(G):
        counts[g] = np.bincount(owner[g], minlength=G + 1)
    remote = counts[:, :G].copy()
    remote[np.arange(G), np.arange(G)] = 0
    k = _pow2(max(1, int(remote.max())))
    l_pad = _pow2(max(1, int(counts[np.arange(G), np.arange(G)].max())))
    starts = np.concatenate(
        [np.zeros((G, 1), np.int64), np.cumsum(counts, axis=1)[:, :-1]], axis=1
    )
    pos = (
        np.arange(n_in) - np.take_along_axis(starts, sorted_owner, axis=1)
    ).astype(np.int32)
    req_idx = np.zeros((G, G, k), np.int32)
    loc_idx = np.zeros((G, l_pad), np.int32)
    inv_perm = np.zeros((G, n_in), np.int32)
    for g in range(G):
        so = sorted_owner[g]
        own = so == g
        rem = (so != g) & (so != G)
        req_idx[so[rem], g, pos[g][rem]] = local[g][order[g][rem]]
        loc_idx[g, pos[g][own]] = local[g][order[g][own]]
        # pad entries (owner G) land on local slot 0: fetched but unread
        dest = np.where(
            own, G * k + pos[g],
            np.where(so == G, G * k, so * k + pos[g]),
        )
        inv_perm[g][order[g]] = dest.astype(np.int32)
    return req_idx, loc_idx, inv_perm


def fetch_plan_stats(
    plan: Tuple[np.ndarray, np.ndarray, np.ndarray],
    input_nodes: np.ndarray,
    shard_size: int,
    n_valid: "np.ndarray | None" = None,
) -> dict:
    """Host-side plan metrics: locality fraction and per-step ICI volume."""
    req_idx, loc_idx, _ = plan
    input_nodes = np.asarray(input_nodes)
    G, n_in = input_nodes.shape
    owner = input_nodes // shard_size
    is_local = owner == np.arange(G)[:, None]
    valid = (
        np.ones((G, n_in), bool) if n_valid is None
        else np.arange(n_in)[None, :] < np.asarray(n_valid)[:, None]
    )
    return {
        "local_frac": int((is_local & valid).sum()) / max(1, int(valid.sum())),
        "k_remote": int(req_idx.shape[2]),
        "rows_over_ici": int(G * (G - 1) * req_idx.shape[2]),
    }


def shard_feature_rows(mesh: Mesh, x: np.ndarray, axis: str = "data"):
    """Pad the node axis to a multiple of the mesh axis and row-shard it.

    Returns ``(x_sharded [G*S, F], shard_size S)`` — the feature-store
    layout consumed by the ``feature_sharded=True`` dp step.
    """
    x = np.asarray(x)
    g = mesh.shape[axis]
    s = -(-x.shape[0] // g)
    pad = g * s - x.shape[0]
    if pad:
        x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
    # shard straight from host memory — the whole array must never be
    # committed to any single device (that is the point of this mode)
    xs = jax.device_put(x, NamedSharding(mesh, P(axis)))
    return xs, s


def make_dp_sampled_step(
    mesh: Mesh,
    fwd: Callable,
    optimizer,
    loss: str = "xent",
    axis: str = "data",
    feature_sharded: bool = False,
):
    """Build a jitted data-parallel train step for stacked sampled batches.

    ``fwd(params, SampledBatch, x_input) -> [B, C]`` is any single-shard
    sampled forward (``sampled_gcn_forward`` / ``sampled_gat_forward``).
    The returned ``step(params, opt_state, blocks, input_nodes, x_full, y)``
    expects the stacked pytree from :func:`stack_shard_batches` /
    :class:`ShardedNeighborSampler` (leading axis = shard) with ``y [G, B]``;
    params / optimizer state / ``x_full`` are replicated. Loss is the mean
    over the global batch; gradients are ``pmean``-reduced over ``axis``.

    ``loss='xent'``: softmax cross-entropy with int labels; ``loss='mse'``:
    mean squared error on ``fwd``'s squeezed scalar output.

    ``feature_sharded=True`` switches to the ROW-SHARDED feature store
    (Reddit/products-scale: ``x`` too big to replicate). ``x_full`` must come
    from :func:`shard_feature_rows` and the step signature becomes
    ``step(params, opt_state, blocks, req_idx, loc_idx, inv_perm, x_shard,
    y)`` with the plan from :func:`build_fetch_plan` on the batch's stacked
    ``input_nodes``. Inside the shard_map each owner gathers the rows remote
    requesters asked for and ONE ``all_to_all`` of ``[G, K, F]`` blocks
    delivers them over ICI; a requester's own rows come from a local gather
    and never touch the wire.
    """
    from jax import shard_map

    def local_loss(params, blocks_local, x_in, y):
        batch = SampledBatch(
            blocks=blocks_local, input_nodes=None, output_nodes=None
        )
        out = fwd(params, batch, x_in)
        if loss == "mse":
            return jnp.mean((out[:, 0] - y) ** 2)
        logp = jax.nn.log_softmax(out, axis=1)
        return -jnp.take_along_axis(logp, y[:, None], axis=1).mean()

    def _squeeze_blocks(blocks):
        # local leading dim is 1 after sharding: squeeze to per-shard shapes
        return [
            SampledBlock(
                cols=b.cols[0], weights=b.weights[0], self_idx=b.self_idx[0]
            )
            for b in blocks
        ]

    def _reduce(l, g):
        return (
            jax.lax.pmean(l, axis),
            jax.tree.map(lambda t: jax.lax.pmean(t, axis), g),
        )

    def shard_grads(params, blocks, input_nodes, x_full, y):
        l, g = jax.value_and_grad(local_loss)(
            params, _squeeze_blocks(blocks), x_full[input_nodes[0]], y[0]
        )
        return _reduce(l, g)

    def shard_grads_fs(params, blocks, req_idx, loc_idx, inv_perm, x_shard, y):
        # as the OWNER: gather the rows each remote requester asked for
        # ([G, K, F]); one all_to_all swaps blocks so requester g receives
        # recv[o] = x_o[req_idx[o, g]]. Own rows never touch the wire —
        # loc_idx gathers them straight from the local shard. inv_perm maps
        # concat(received, local) back to sampling order.
        send = x_shard[req_idx[0]]
        recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0)
        loc = x_shard[loc_idx[0]]
        rows = jnp.concatenate(
            [recv.reshape(-1, x_shard.shape[-1]), loc], axis=0
        )
        l, g = jax.value_and_grad(local_loss)(
            params, _squeeze_blocks(blocks), rows[inv_perm[0]], y[0]
        )
        return _reduce(l, g)

    block_spec = SampledBlock(cols=P(axis), weights=P(axis), self_idx=P(axis))

    if feature_sharded:

        @jax.jit
        def step(params, opt_state, blocks, req_idx, loc_idx, inv_perm,
                 x_shard, y):
            smapped = shard_map(
                shard_grads_fs,
                mesh=mesh,
                in_specs=(P(), [block_spec] * len(blocks), P(axis), P(axis),
                          P(axis), P(axis), P(axis)),
                out_specs=(P(), P()),
                check_vma=False,
            )
            l, grads = smapped(
                params, blocks, req_idx, loc_idx, inv_perm, x_shard, y
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, l

    else:

        @jax.jit
        def step(params, opt_state, blocks, input_nodes, x_full, y):
            smapped = shard_map(
                shard_grads,
                mesh=mesh,
                in_specs=(P(), [block_spec] * len(blocks), P(axis), P(),
                          P(axis)),
                out_specs=(P(), P()),
                check_vma=False,
            )
            l, grads = smapped(params, blocks, input_nodes, x_full, y)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, l

    def place(blocks, input_nodes, y):
        """Device-put a stacked batch with the right shardings.

        Replicated mode: ``input_nodes`` is the stacked ``[G, n_in]`` index
        array. Feature-sharded mode: pass the ``(req_idx, loc_idx,
        inv_perm)`` plan from :func:`build_fetch_plan` instead and three
        arrays come back.
        """
        shard = NamedSharding(mesh, P(axis))
        blocks = [
            SampledBlock(
                cols=jax.device_put(b.cols, shard),
                weights=jax.device_put(b.weights, shard),
                self_idx=jax.device_put(b.self_idx, shard),
            )
            for b in blocks
        ]
        if feature_sharded:
            req_idx, loc_idx, inv_perm = input_nodes
            return (
                blocks,
                jax.device_put(jnp.asarray(req_idx), shard),
                jax.device_put(jnp.asarray(loc_idx), shard),
                jax.device_put(jnp.asarray(inv_perm), shard),
                jax.device_put(jnp.asarray(y), shard),
            )
        return (
            blocks,
            jax.device_put(jnp.asarray(input_nodes), shard),
            jax.device_put(jnp.asarray(y), shard),
        )

    step.place = place
    return step
