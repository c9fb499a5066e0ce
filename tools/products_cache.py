"""Build-once cache of the products-scale benchmark graph (r4 campaign).

Every products-scale TPU probe pays ~4-5 min of host preprocessing (graph
gen 74s + native LP ordering 163s + reorder + layout splits) before it can
measure anything, and the fresh-process-per-measurement discipline
(CLAUDE.md r3: per-op throughput depends on allocation history) multiplies
that by every case. This script runs the deterministic pipeline once and
caches:

- ``/tmp/products_lp.npz``     — the LP-ordered symmetric normalized COO;
- ``/tmp/products_split.npz``  — the hybrid dense-tile / residual edge split
  (min_edges_per_tile=64, 1 GiB tile budget — the r3 measured config).

Probes rebuild device layouts from these in seconds. Pure host work: runs
on the CPU backend so it never touches the TPU tunnel lease.

Reference analog: the adjacency build at reference ``pygcn/utils.py:93-132``
(cached ``adj_<msa>.npy`` — same cache-the-preprocessing idea at toy scale).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import scipy.sparse as sp

from pygcn_tpu.graph.datasets import community_graph
from pygcn_tpu.graph.graph import Graph
from pygcn_tpu.graph.transform import sym_normalize, symmetrize_max
from pygcn_tpu.parallel.partition import locality_order

N_NODES = 2_449_029
AVG_DEG = 13.0


def log(**kw):
    print(json.dumps(kw), flush=True)


def main():
    t0 = time.time()
    adj = sym_normalize(symmetrize_max(
        community_graph(N_NODES, AVG_DEG, seed=0, shuffle=True)))
    log(stage="graph_built", n_edges=int(adj.nnz), host_s=time.time() - t0)

    t0 = time.time()
    g0 = Graph.from_scipy(adj, is_symmetric=True, build_dense=False,
                          build_bcsr=False, build_ell=False,
                          build_hybrid=False, build_colpanel=False)
    perm = locality_order(g0, "lp")
    del g0
    adj = adj.tocsr()[perm][:, perm].tocoo()
    log(stage="lp_reordered", host_s=time.time() - t0)

    np.savez("/tmp/products_lp.npz",
             row=adj.row.astype(np.int32), col=adj.col.astype(np.int32),
             data=adj.data.astype(np.float32), n=np.int64(adj.shape[0]))
    log(stage="lp_saved")

    # hybrid tile/residual split at the r3 measured config
    t0 = time.time()
    tm = tk = 128
    n_block_cols = -(-adj.shape[1] // tk)
    tile_ids = (adj.row // tm).astype(np.int64) * n_block_cols + adj.col // tk
    uniq, inverse, counts = np.unique(tile_ids, return_inverse=True,
                                      return_counts=True)
    qualifies = counts >= 64
    max_tiles = (1 << 30) // (tm * tk * 4)
    if int(qualifies.sum()) > max_tiles:
        order = np.argsort(-counts)
        keep = np.zeros_like(qualifies)
        keep[order[qualifies[order]][:max_tiles]] = True
        qualifies = keep
    dense_tile = qualifies[inverse]
    np.savez("/tmp/products_split.npz",
             trow=adj.row[dense_tile].astype(np.int32),
             tcol=adj.col[dense_tile].astype(np.int32),
             tdata=adj.data[dense_tile].astype(np.float32),
             rrow=adj.row[~dense_tile].astype(np.int32),
             rcol=adj.col[~dense_tile].astype(np.int32),
             rdata=adj.data[~dense_tile].astype(np.float32),
             n=np.int64(adj.shape[0]))
    log(stage="split_saved", tile_edges=int(dense_tile.sum()),
        tile_frac=float(dense_tile.mean()), host_s=time.time() - t0)
    log(stage="done")


if __name__ == "__main__":
    main()
