"""Multi-device SpMM scaling harness (edges/s at 1..N shards).

On a real pod slice this measures the BASELINE scaling-efficiency target
(edges/s from 1 host to N hosts, halo exchange over ICI). On a single-chip or
CPU environment it validates the distributed path end-to-end and reports the
observed scaling on the virtual device mesh (not meaningful as hardware
efficiency — the virtual devices share one machine).

Usage::

    python bench_scaling.py [--n_nodes 200000] [--avg_degree 8] [--devices 1 2 4 8]
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_nodes", type=int, default=100_000)
    ap.add_argument("--avg_degree", type=float, default=8.0)
    ap.add_argument("--h", type=int, default=128)
    ap.add_argument("--devices", type=int, nargs="+", default=None)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--cpu_devices", type=int, default=8)
    ap.add_argument("--order", choices=["none", "bfs", "louvain", "auto"], default="none",
                    help="locality-aware node reordering before partitioning")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)

    import jax.numpy as jnp
    import numpy as np

    from pygcn_tpu.graph.datasets import chung_lu_graph
    from pygcn_tpu.graph.graph import Graph
    from pygcn_tpu.graph.transform import sym_normalize, symmetrize_max
    from pygcn_tpu.parallel import build_dist_plan, make_dist_spmm, make_mesh
    from pygcn_tpu.parallel.dist_spmm import pad_node_features, shard_features
    from pygcn_tpu.utils.benchmark import time_chained

    n_avail = len(jax.devices())
    device_counts = args.devices or sorted({d for d in (1, 2, 4, 8) if d <= n_avail})

    adj = sym_normalize(symmetrize_max(chung_lu_graph(args.n_nodes, args.avg_degree, seed=0)))
    graph = Graph.from_scipy(
        adj, is_symmetric=True, build_dense=False, build_bcsr=False, build_ell=False
    )
    if args.order != "none":
        from pygcn_tpu.parallel.partition import locality_order, reorder_graph

        graph, _ = reorder_graph(graph, locality_order(graph, args.order))
        print(f"reordered nodes with {args.order} locality ordering")
    print(f"graph: {graph.n_nodes} nodes, {graph.n_edges} edges, "
          f"{n_avail} devices ({jax.devices()[0].platform})")

    results = {}
    for nd in device_counts:
        mesh = make_mesh([nd], ["graph"])
        plan = build_dist_plan(graph, nd, align=128)
        dist_spmm = make_dist_spmm(mesh, plan)
        x = shard_features(
            pad_node_features(
                jnp.asarray(np.random.default_rng(0).normal(
                    size=(graph.n_nodes, args.h)).astype(np.float32)),
                plan,
            ),
            mesh,
        )
        t = time_chained(dist_spmm, x, iters=16, reps=3)
        eps = graph.n_edges / t
        halo_frac = float(plan.rem_w.astype(bool).sum()) / max(graph.n_edges, 1)
        results[nd] = eps
        print(f"  {nd} device(s): {t * 1e3:8.2f} ms  {eps / 1e6:8.1f} Medges/s  "
              f"(remote-edge fraction {halo_frac:.2%})")

    if len(results) > 1:
        base = results[min(results)]
        top = max(results)
        eff = results[top] / (base * top / min(results))
        print(json.dumps({
            "metric": f"dist_spmm scaling efficiency {min(results)}->{top} devices",
            "value": eff,
            "edges_per_s": results,
        }))


if __name__ == "__main__":
    main()
