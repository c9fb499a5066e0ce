"""Build-once cache of the products-scale CONVERGENCE dataset (r4 flagship).

``train_fullgraph --clustered`` at 2.45M nodes pays ~6 min of host work
(community graph 76s + LP ordering ~3 min + feature synthesis) before the
first TPU step. This script runs that deterministic pipeline once and saves
the LP-ordered dataset in the ``.npz`` interchange format, so flagship
attempts (compile-cap retries, layout A/Bs) restart in seconds via
``train_fullgraph --clustered --npz /tmp/products_ds.npz``.

Pure host work (CPU backend — never touches the TPU tunnel lease).
Reference analog: the cached ``adj_<msa>.npy`` protocol at reference
``pygcn/utils.py:93-132``.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from pygcn_tpu.graph.datasets import community_classification, save_npz_dataset
from pygcn_tpu.parallel.partition import locality_order, reorder_dataset

N_NODES = 2_449_029
AVG_DEG = 13.0


def log(**kw):
    print(json.dumps(kw), flush=True)


def main():
    t0 = time.time()
    data = community_classification(
        n=N_NODES, avg_degree=AVG_DEG, seed=0,
        build_dense=False, build_bcsr=False, build_ell=False,
        build_hybrid=False, build_colpanel=False,
    )
    log(stage="dataset_built", n_edges=int(data.graph.n_edges),
        host_s=time.time() - t0)

    t0 = time.time()
    perm = locality_order(data.graph, "lp")
    data = reorder_dataset(data, perm)
    log(stage="lp_reordered", host_s=time.time() - t0)

    t0 = time.time()
    save_npz_dataset("/tmp/products_ds.npz", data)
    log(stage="saved", host_s=time.time() - t0)
    log(stage="done")


if __name__ == "__main__":
    main()
