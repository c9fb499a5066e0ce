"""Distributed SpMM over a device mesh: halo exchange + local aggregation.

``make_dist_spmm(mesh, plan)`` returns ``f(x) -> A @ x`` where ``x`` is the
globally-padded ``[P·S, F]`` feature matrix sharded row-wise over the mesh's
``"graph"`` axis. Per device:

1. gather its boundary rows for every peer (``plan.send_idx``) — [P, halo, F];
2. one tiled ``all_to_all`` over ICI delivers each device its halo table;
3. two segment-sums: local edges aggregate from the resident shard, remote
   edges from the halo table. The local sum has no data dependency on the
   collective, so XLA overlaps communication with local aggregation.

Backward passes need no extra machinery: the VJP of gather/segment-sum is
scatter/gather with swapped roles and the VJP of ``all_to_all`` is the inverse
``all_to_all`` — XLA derives the reverse halo exchange automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pygcn_tpu.parallel.partition import DistPlan


def make_dist_spmm(
    mesh: Mesh, plan: DistPlan, axis: str = "graph", col_axis: str | None = None,
    parts: str = "full",
):
    """Build the shard_mapped SpMM. ``x``: [P·S, F] sharded P(axis) → same.

    ``col_axis`` additionally shards the feature *columns* over a second mesh
    axis (the 2-D graph×data composition: every per-device op here is
    column-wise independent, so a data-sharded wide batch stays put — no
    all-gather over the data axis, the halo all_to_all moves only the local
    column shard).

    ``parts`` selects a component for cost attribution (``bench_scaling.py
    --halo_report``): ``"local"`` skips the halo exchange and remote
    aggregation entirely; ``"halo"`` runs only the boundary gather +
    all_to_all + remote aggregation. ``"full"`` (default) is the real op —
    the two component timings bracket it, and their overshoot over the full
    time is the measured comm/compute overlap.
    """

    use_ell = plan.loc_ell is not None and plan.rem_ell is not None
    if parts not in ("full", "local", "halo"):
        raise ValueError(f"unknown parts {parts!r}")

    def local_fn(x, loc_edges, rem_edges, send_idx):
        # shard_map delivers the per-device slices with the leading shard axis
        # collapsed to size 1.
        send_idx = send_idx[0]  # [P, halo]

        if parts != "local":
            outgoing = jnp.take(x, send_idx.reshape(-1), axis=0).reshape(
                send_idx.shape[0], send_idx.shape[1], x.shape[1]
            )
            halo_in = jax.lax.all_to_all(
                outgoing, axis, split_axis=0, concat_axis=0, tiled=True
            )  # [P, halo, F]: slice o = rows shard o sent to us
            halo_flat = halo_in.reshape(-1, x.shape[1])
        else:
            halo_flat = jnp.zeros((1, x.shape[1]), x.dtype)

        y_local = y_remote = None
        if use_ell:
            from pygcn_tpu.ops.ell import ell_apply_arrays

            (lc, lv, lr) = loc_edges
            (rc, rv, rr) = rem_edges
            if parts != "halo":
                y_local = ell_apply_arrays(
                    tuple(c[0] for c in lc), tuple(v[0] for v in lv),
                    tuple(r[0] for r in lr), plan.shard_size, x,
                )
            if parts != "local":
                y_remote = ell_apply_arrays(
                    tuple(c[0] for c in rc), tuple(v[0] for v in rv),
                    tuple(r[0] for r in rr), plan.shard_size, halo_flat,
                )
        else:
            loc_s, loc_r, loc_w = (e[0] for e in loc_edges)
            rem_h, rem_r, rem_w = (e[0] for e in rem_edges)
            if parts != "halo":
                y_local = jax.ops.segment_sum(
                    jnp.take(x, loc_s, axis=0) * loc_w[:, None],
                    loc_r,
                    num_segments=plan.shard_size,
                )
            if parts != "local":
                y_remote = jax.ops.segment_sum(
                    jnp.take(halo_flat, rem_h, axis=0) * rem_w[:, None],
                    rem_r,
                    num_segments=plan.shard_size,
                )
        if y_local is None:
            return y_remote
        if y_remote is None:
            return y_local
        return y_local + y_remote

    if use_ell:
        loc_edges = plan.loc_ell
        rem_edges = plan.rem_ell
        # every stacked array is 2-D: cols/vals [P, Nb·K] (flat buckets),
        # rows [P, Nb]
        edge_spec = jax.tree.map(lambda _: P(axis, None), loc_edges)
        rem_spec = jax.tree.map(lambda _: P(axis, None), rem_edges)
    else:
        loc_edges = (plan.loc_s, plan.loc_r, plan.loc_w)
        rem_edges = (plan.rem_h, plan.rem_r, plan.rem_w)
        edge_spec = (P(axis, None), P(axis, None), P(axis, None))
        rem_spec = edge_spec

    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis, col_axis), edge_spec, rem_spec, P(axis, None, None)),
        out_specs=P(axis, col_axis),
    )

    def f(x: jax.Array) -> jax.Array:
        return sharded(x, loc_edges, rem_edges, plan.send_idx)

    return f


def pad_node_features(x: jax.Array, plan: DistPlan) -> jax.Array:
    """Zero-pad [N, F] node features to the plan's [P·S, F] padded size."""
    pad = plan.n_nodes_padded - x.shape[0]
    return jnp.pad(x, ((0, pad), (0, 0))) if pad else x


def shard_features(x: jax.Array, mesh: Mesh, axis: str = "graph") -> jax.Array:
    return jax.device_put(x, NamedSharding(mesh, P(axis, None)))
