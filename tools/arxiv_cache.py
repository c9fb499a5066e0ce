"""Cache the bench.py arxiv-scale clustered graph, LP-ordered, to
/tmp/arxiv_lp.npz so fresh-process probes (tools/probe_arxiv_r5.py) skip
the ~1 min host pipeline. Host-only (no TPU client)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from bench import build_clustered
    from pygcn_tpu.graph.graph import Graph
    from pygcn_tpu.parallel.partition import locality_order

    t0 = time.time()
    adj = build_clustered()
    g0 = Graph.from_scipy(
        adj, is_symmetric=True, build_dense=False, build_bcsr=False,
        build_ell=False, build_hybrid=False, build_colpanel=False,
    )
    perm = locality_order(g0, "lp")
    adj_lp = adj.tocsr()[perm][:, perm].tocoo()
    np.savez(
        "/tmp/arxiv_lp.npz", n=adj_lp.shape[0], row=adj_lp.row.astype(np.int32),
        col=adj_lp.col.astype(np.int32), data=adj_lp.data.astype(np.float32),
    )
    print(f"cached {adj_lp.nnz} edges in {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
