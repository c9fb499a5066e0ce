"""Products-scale partition/halo plan report (VERDICT r2 #1b).

Round 2's HALO_REPORT.json measured halo-exchange economics at arxiv scale
only; BASELINE's scaling target names ogbn-products over 4 hosts. This
builds the REAL partition/halo plans (``parallel/partition.build_dist_plan``,
host-side NumPy — topology-exact byte counts, no device work) on the same
2.45M-node / 63.4M-edge LP-ordered community graph the single-chip sweep
measures, for P = 2/4/8, and emits ``HALO_REPORT_products.json`` with the
1→P scaling model re-based on the MEASURED products-scale local rate
(pass ``--base_edges_per_s`` from tools/bench_products.py's best layout).

Run (CPU-only, ~10 min host work):

    python tools/halo_products.py --base_edges_per_s <rate> \
        --out HALO_REPORT_products.json
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

N_NODES = 2_449_029
AVG_DEG = 13.0
H = 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base_edges_per_s", type=float, required=True,
                    help="measured products-scale single-chip SpMM rate "
                         "(tools/bench_products.py best layout)")
    ap.add_argument("--ici_gbps", type=float, default=45.0)
    ap.add_argument("--out", default="HALO_REPORT_products.json")
    ap.add_argument("--devices", type=int, nargs="+", default=[2, 4, 8])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from pygcn_tpu.graph.datasets import community_graph
    from pygcn_tpu.graph.graph import Graph
    from pygcn_tpu.graph.transform import sym_normalize, symmetrize_max
    from pygcn_tpu.parallel.partition import build_dist_plan, locality_order

    t0 = time.time()
    adj = sym_normalize(symmetrize_max(
        community_graph(N_NODES, AVG_DEG, seed=0, shuffle=True)))
    g0 = Graph.from_scipy(adj, is_symmetric=True, build_dense=False,
                          build_bcsr=False, build_ell=False,
                          build_hybrid=False, build_colpanel=False)
    perm = locality_order(g0, "lp")
    adj = adj.tocsr()[perm][:, perm].tocoo()
    graph = Graph.from_scipy(adj, is_symmetric=True, build_dense=False,
                             build_bcsr=False, build_ell=False,
                             build_hybrid=False, build_colpanel=False)
    print(f"graph + LP order: {time.time() - t0:.0f}s", flush=True)

    report = {
        "n_nodes": graph.n_nodes, "n_edges": graph.n_edges, "h": H,
        "order": "lp", "ici_gbps": args.ici_gbps,
        "model_base_edges_per_s": args.base_edges_per_s,
        "per_devices": {}, "scaling_model": {},
    }
    row_bytes = H * 4
    for nd in args.devices:
        t1 = time.time()
        plan = build_dist_plan(graph, nd, align=128, build_ell=False)
        n_remote = int(np.asarray(plan.rem_w).astype(bool).sum())
        entry = {
            "plan_build_s": time.time() - t1,
            "remote_edge_frac": n_remote / graph.n_edges,
            "halo_rows_per_pair": plan.halo,
            "ici_bytes_per_device_fwd": (nd - 1) * plan.halo * row_bytes,
            "halo_dedup_ratio": n_remote / max(nd * (nd - 1) * plan.halo, 1),
            "shard_size": plan.shard_size,
        }
        report["per_devices"][nd] = entry
        t_local = graph.n_edges / nd / args.base_edges_per_s
        t_halo = entry["ici_bytes_per_device_fwd"] / (args.ici_gbps * 1e9)
        base_t = graph.n_edges / args.base_edges_per_s
        report["scaling_model"][nd] = {
            "t_local_model_s": t_local,
            "t_halo_model_s": t_halo,
            "efficiency_full_overlap": base_t / (nd * max(t_local, t_halo)),
            "efficiency_no_overlap": base_t / (nd * (t_local + t_halo)),
        }
        print(json.dumps({"P": nd, **entry,
                          **report["scaling_model"][nd]}), flush=True)
        del plan

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"-> {args.out}", flush=True)


if __name__ == "__main__":
    main()
