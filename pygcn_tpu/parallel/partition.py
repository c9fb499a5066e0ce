"""Static edge-partition + halo-exchange planning for distributed SpMM.

The graph is 1-D row-partitioned over ``n_shards`` devices: shard *i* owns a
contiguous node range (rows of A, rows of X, rows of Y). Every edge lives on
the shard owning its *receiver*. Edges are split into

- **local** edges (sender also owned) — aggregated straight from the local
  feature shard, and
- **remote** edges — their senders' features arrive via a single all-to-all
  ("halo exchange"): each shard pre-computes, per peer, the unique feature rows
  the peer needs (``send_idx``), so only boundary nodes travel over ICI, once,
  regardless of how many edges reference them.

Everything here is host-side NumPy executed once per graph; the resulting
:class:`DistPlan` arrays are static, so the jitted/shard_mapped compute path
has fixed shapes. Splitting local vs remote aggregation also lets XLA's
scheduler overlap the all-to-all with the local segment-sum.

No reference counterpart (the reference is single-GPU); mandated by the
BASELINE north star (edge-partitioned multi-host scaling with halo exchange).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pygcn_tpu.graph.graph import Graph  # noqa: F401 (used in helpers)


def _pad_to(x: int, m: int) -> int:
    return max(m, -(-x // m) * m)


@dataclasses.dataclass(frozen=True)
class DistPlan:
    """Per-shard static index plan (leading axis = shard)."""

    # local edges: senders/receivers in shard-local coordinates
    loc_s: jax.Array  # [P, E_loc]
    loc_r: jax.Array  # [P, E_loc]
    loc_w: jax.Array  # [P, E_loc]
    # remote edges: sender indexes the flattened incoming halo table
    rem_h: jax.Array  # [P, E_rem]
    rem_r: jax.Array  # [P, E_rem]
    rem_w: jax.Array  # [P, E_rem]
    # send_idx[o, i, k]: k-th local row shard o ships to shard i
    send_idx: jax.Array  # [P, P, halo]
    # optional stacked per-shard ELL layouts for scatter-free local compute
    loc_ell: object  # (cols, vals, rows) tuples of [P, Nb, K] arrays, or None
    rem_ell: object
    n_shards: int
    shard_size: int  # nodes per shard (padded)
    halo: int  # halo slots per (src, dst) pair
    n_nodes: int  # true node count

    @property
    def n_nodes_padded(self) -> int:
        return self.n_shards * self.shard_size


jax.tree_util.register_dataclass(
    DistPlan,
    data_fields=["loc_s", "loc_r", "loc_w", "rem_h", "rem_r", "rem_w", "send_idx",
                 "loc_ell", "rem_ell"],
    meta_fields=["n_shards", "shard_size", "halo", "n_nodes"],
)


def build_dist_plan(graph: Graph, n_shards: int, *, align: int = 8,
                    build_ell: bool = True) -> DistPlan:
    e = graph.n_edges
    senders = np.asarray(graph.senders[:e], np.int64)
    receivers = np.asarray(graph.receivers[:e], np.int64)
    weights = np.asarray(graph.weights[:e])

    shard_size = _pad_to(-(-graph.n_nodes // n_shards), align)
    owner_s = senders // shard_size
    owner_r = receivers // shard_size

    loc_s, loc_r, loc_w = [], [], []
    rem_h, rem_r, rem_w = [], [], []
    halo_sets: list[list[np.ndarray]] = []  # halo_sets[i][o] = unique senders i needs from o

    for i in range(n_shards):
        mine = owner_r == i
        s_i, r_i, w_i = senders[mine], receivers[mine] - i * shard_size, weights[mine]
        local = owner_s[mine] == i
        loc_s.append(s_i[local] - i * shard_size)
        loc_r.append(r_i[local])
        loc_w.append(w_i[local])

        per_owner = []
        rs, rr, rw = s_i[~local], r_i[~local], w_i[~local]
        ro = rs // shard_size
        for o in range(n_shards):
            per_owner.append(np.unique(rs[ro == o]))
        halo_sets.append(per_owner)
        rem_h.append((rs, rr, rw, ro))

    halo = _pad_to(
        max(
            (halo_sets[i][o].size for i in range(n_shards) for o in range(n_shards)),
            default=1,
        ),
        align,
    )

    # send_idx[o][i]: local rows o ships to i (= halo_sets[i][o], o-local coords)
    send_idx = np.zeros((n_shards, n_shards, halo), np.int32)
    for i in range(n_shards):
        for o in range(n_shards):
            u = halo_sets[i][o]
            send_idx[o, i, : u.size] = u - o * shard_size

    # remap remote senders into the incoming halo table: slot o*halo + position
    e_rem = _pad_to(max((t[0].size for t in rem_h), default=1), align)
    rem_h_arr = np.zeros((n_shards, e_rem), np.int32)
    rem_r_arr = np.zeros((n_shards, e_rem), np.int32)
    rem_w_arr = np.zeros((n_shards, e_rem), weights.dtype)
    for i, (rs, rr, rw, ro) in enumerate(rem_h):
        pos = np.empty(rs.size, np.int64)
        for o in range(n_shards):
            m = ro == o
            pos[m] = o * halo + np.searchsorted(halo_sets[i][o], rs[m])
        rem_h_arr[i, : rs.size] = pos
        rem_r_arr[i, : rr.size] = rr
        rem_w_arr[i, : rw.size] = rw

    e_loc = _pad_to(max((a.size for a in loc_s), default=1), align)
    loc_s_arr = np.zeros((n_shards, e_loc), np.int32)
    loc_r_arr = np.zeros((n_shards, e_loc), np.int32)
    loc_w_arr = np.zeros((n_shards, e_loc), weights.dtype)
    for i in range(n_shards):
        loc_s_arr[i, : loc_s[i].size] = loc_s[i]
        loc_r_arr[i, : loc_r[i].size] = loc_r[i]
        loc_w_arr[i, : loc_w[i].size] = loc_w[i]

    # Stacked per-shard ELL layouts: the shard-local aggregation then runs
    # the scatter-free gather+reduce path instead of per-edge segment_sum
    # (the same ~2.6x that ELL buys single-chip; see PERF_NOTES.md).
    loc_ell = rem_ell = None
    if build_ell:
        import scipy.sparse as _sp

        from pygcn_tpu.ops.ell import build_ell_stacked

        loc_mats, rem_mats = [], []
        for i in range(n_shards):
            ns = loc_s_arr[i].astype(np.int64)
            nr = loc_r_arr[i].astype(np.int64)
            nw = loc_w_arr[i]
            keep = nw != 0
            loc_mats.append(_sp.csr_matrix(
                (nw[keep], (nr[keep], ns[keep])), shape=(shard_size, shard_size)))
            hs = rem_h_arr[i].astype(np.int64)
            hr = rem_r_arr[i].astype(np.int64)
            hw = rem_w_arr[i]
            keep = hw != 0
            rem_mats.append(_sp.csr_matrix(
                (hw[keep], (hr[keep], hs[keep])),
                shape=(shard_size, n_shards * halo)))
        lc, lv, lr, _ = build_ell_stacked(loc_mats)
        rc, rv, rr, _ = build_ell_stacked(rem_mats)
        loc_ell = (lc, lv, lr)
        rem_ell = (rc, rv, rr)

    return DistPlan(
        loc_s=jnp.asarray(loc_s_arr),
        loc_r=jnp.asarray(loc_r_arr),
        loc_w=jnp.asarray(loc_w_arr),
        rem_h=jnp.asarray(rem_h_arr),
        rem_r=jnp.asarray(rem_r_arr),
        rem_w=jnp.asarray(rem_w_arr),
        send_idx=jnp.asarray(send_idx),
        loc_ell=loc_ell,
        rem_ell=rem_ell,
        n_shards=n_shards,
        shard_size=shard_size,
        halo=halo,
        n_nodes=graph.n_nodes,
    )


def locality_order(graph: Graph, method: str = "auto") -> np.ndarray:
    """Node ordering for partition locality.

    Contiguous range partitioning of an arbitrary node labeling scatters
    communities across shards (45-79% remote edges on random graphs, see
    bench_scaling.py). ``'louvain'`` orders nodes community-by-community
    (best halo reduction; Python cost grows steeply with edges, used
    automatically below ~1M edges); ``'lp'`` is native weighted label
    propagation (near-linear C++, the scale path — used automatically above
    1M edges when the graphkit library is built); ``'bfs'`` keeps
    neighborhoods contiguous and needs only scipy. Returns ``perm`` with
    ``perm[new_id] = old_id``.
    """
    from pygcn_tpu.utils import native

    if method == "auto":
        if graph.n_edges < 1_000_000:
            method = "louvain"
        else:
            method = "lp" if native.available() else "bfs"
    if method == "louvain":
        import networkx as nx

        a = graph.to_scipy().tocsr()
        g_nx = nx.from_scipy_sparse_array(a)
        comms = nx.community.louvain_communities(g_nx, seed=0)
        comms = sorted(comms, key=len, reverse=True)
        return np.asarray([n for c in comms for n in sorted(c)], np.int64)
    if method == "lp":
        import scipy.sparse.csgraph as csgraph

        a = graph.to_scipy().tocsr()
        labels = native.label_propagation(a.indptr, a.indices, a.data)
        # communities largest-first; WITHIN each community order nodes by a
        # BFS of the induced subgraph — LP communities are coarse (thousands
        # of nodes), and intra-community BFS order is what makes 128-node
        # id ranges share neighborhoods, i.e. what fills the hybrid layout's
        # MXU tiles (ops/hybrid.py).
        _, inv, counts = np.unique(labels, return_inverse=True, return_counts=True)
        rank = np.argsort(np.argsort(-counts, kind="stable"), kind="stable")
        order = []
        for comm in np.argsort(-counts, kind="stable"):
            nodes = np.nonzero(inv == comm)[0]
            if nodes.size <= 2:
                order.append(nodes)
                continue
            sub = a[nodes][:, nodes]
            seen = np.zeros(nodes.size, bool)
            sub_order = []
            deg = np.asarray((sub != 0).sum(axis=1)).ravel()
            while len(sub_order) < nodes.size:
                seeds = np.nonzero(~seen)[0]
                start = seeds[np.argmax(deg[seeds])]
                hit = csgraph.breadth_first_order(
                    sub, int(start), directed=False, return_predecessors=False
                )
                hit = hit[~seen[hit]]
                seen[hit] = True
                sub_order.extend(hit.tolist())
            order.append(nodes[np.asarray(sub_order)])
        return np.concatenate(order).astype(np.int64)

    import scipy.sparse.csgraph as csgraph

    a = graph.to_scipy().tocsr()
    deg = np.asarray((a != 0).sum(axis=1)).ravel()
    visited = np.zeros(graph.n_nodes, bool)
    order = []
    while len(order) < graph.n_nodes:
        seeds = np.nonzero(~visited)[0]
        start = seeds[np.argmax(deg[seeds])]
        nodes = csgraph.breadth_first_order(a, int(start), directed=False,
                                            return_predecessors=False)
        nodes = nodes[~visited[nodes]]
        visited[nodes] = True
        order.extend(nodes.tolist())
    return np.asarray(order, np.int64)


def reorder_graph(graph: Graph, perm: np.ndarray) -> tuple:
    """Relabel nodes by ``perm`` (perm[new_id] = old_id).

    Returns ``(new_graph, inv)`` where features/labels must be taken as
    ``x[perm]`` and outputs map back with ``y_new[inv] == y_old`` ... i.e.
    ``inv[old_id] = new_id``.
    """
    inv = np.empty(graph.n_nodes, np.int64)
    inv[perm] = np.arange(graph.n_nodes)
    e = graph.n_edges
    senders = inv[np.asarray(graph.senders[:e])]
    receivers = inv[np.asarray(graph.receivers[:e])]
    weights = np.asarray(graph.weights[:e])
    # mirror the source graph's layout set EXPLICITLY (with its build
    # hyperparameters) — leaving flags unset would invoke the layout-by-
    # scale auto-policy and build layouts the caller deliberately skipped
    new_graph = Graph.from_coo(
        senders, receivers, weights, n_nodes=graph.n_nodes,
        is_symmetric=graph.is_symmetric,
        build_dense=graph.dense is not None,
        build_bcsr=graph.bcsr is not None,
        build_ell=graph.ell is not None,
        build_hybrid=graph.hybrid is not None,
        build_panel=graph.panel is not None,
        build_colpanel=graph.colpanel is not None,
        **dict(graph.build_meta),
    )
    return new_graph, inv


def reorder_dataset(data, perm: np.ndarray):
    """Relabel a whole node-classification dataset by ``perm``.

    Applies :func:`reorder_graph` and permutes features/labels/splits
    consistently, so training on the result is the identical problem under
    new node ids. Pair with :func:`locality_order` to make communities
    id-contiguous — the layout that lets contiguous row shards own
    communities (``shard_feature_rows`` + ``align_shard_size``) and the
    hybrid BCSR layout fill MXU tiles.
    """
    from pygcn_tpu.graph.datasets import NodeClassificationData

    new_graph, inv = reorder_graph(data.graph, perm)
    return NodeClassificationData(
        graph=new_graph,
        features=np.asarray(data.features)[perm],
        labels=np.asarray(data.labels)[perm],
        idx_train=inv[np.asarray(data.idx_train)],
        idx_val=inv[np.asarray(data.idx_val)],
        idx_test=inv[np.asarray(data.idx_test)],
        n_classes=data.n_classes,
    )
