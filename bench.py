"""Benchmark: SpMM throughput (the framework's hot op) on real TPU hardware.

Workload: ``A_hat @ X`` on an ogbn-arxiv-scale synthetic power-law graph
(169K nodes, ~1.2M edges, 128 features) — the BASELINE.json headline metric
(edges/s/chip). The best available single-chip implementation is timed;
``vs_baseline`` compares against the reference's op (``torch.spmm``, reference
pygcn/layers.py:34) executed with CPU torch on the identical graph, the only
hardware the reference stack can use here.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import numpy as np


N_NODES = 169_343
AVG_DEG = 7.1  # ~1.2M edges
H = 128
WARMUP = 3
ITERS = 20


def build_graph():
    from pygcn_tpu.graph.datasets import chung_lu_graph
    from pygcn_tpu.graph.transform import sym_normalize, symmetrize_max

    adj = sym_normalize(symmetrize_max(chung_lu_graph(N_NODES, AVG_DEG, seed=0)))
    return adj


def bench_tpu(adj) -> tuple[float, int]:
    import jax.numpy as jnp

    from pygcn_tpu.graph.graph import Graph
    from pygcn_tpu.ops.spmm import spmm
    from pygcn_tpu.utils.benchmark import time_chained

    graph = Graph.from_scipy(
        adj, is_symmetric=True, build_dense=False, build_bcsr=None
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(graph.n_nodes, H)).astype(np.float32)
    )

    # sym-normalized A has spectral radius <= 1, so chained applications are
    # numerically stable.
    t = time_chained(lambda v: spmm(graph, v), x, iters=ITERS)
    return t, graph.n_edges


def bench_torch_cpu(adj, n_edges: int) -> float:
    import torch

    torch.set_num_threads(max(1, (os_cpu_count := __import__("os").cpu_count() or 1)))
    coo = adj.tocoo()
    idx = torch.tensor(np.vstack([coo.row, coo.col]), dtype=torch.int64)
    vals = torch.tensor(coo.data, dtype=torch.float32)
    a = torch.sparse_coo_tensor(idx, vals, coo.shape).coalesce()
    x = torch.randn(coo.shape[0], H)
    for _ in range(2):
        torch.spmm(a, x)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        torch.spmm(a, x)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    adj = build_graph()
    t_tpu, n_edges = bench_tpu(adj)
    edges_per_s = n_edges / t_tpu
    try:
        t_ref = bench_torch_cpu(adj, n_edges)
        vs_baseline = t_ref / t_tpu
    except Exception:
        vs_baseline = float("nan")
    print(
        json.dumps(
            {
                "metric": "spmm_edges_per_s_per_chip (arxiv-scale power-law, H=128; "
                "vs_baseline = reference torch.spmm on CPU)",
                "value": edges_per_s,
                "unit": "edges/s",
                "vs_baseline": vs_baseline,
            }
        )
    )


if __name__ == "__main__":
    main()
