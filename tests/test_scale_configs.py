"""Tiny-scaled versions of BASELINE.json's large configs (VERDICT r1 item 2).

The real-scale runs (233K nodes / 114M edges sampled "Reddit" config;
2.45M nodes / 63M edges full-graph "products" config) are measured on the
TPU and recorded in PERF_NOTES.md; these tests keep the exact build paths
those runs exercise — community graph -> LP locality order -> ELL + hybrid +
partition builders, and dense-neighborhood sampled training — compiling and
correct at CI scale.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.apps


def test_products_config_tiny():
    """Products-shaped pipeline: shuffled community graph, LP ordering,
    ELL + hybrid + distributed partition builders, full-graph SpMM."""
    import jax.numpy as jnp

    from pygcn_tpu.graph.datasets import community_graph
    from pygcn_tpu.graph.graph import Graph
    from pygcn_tpu.graph.transform import sym_normalize, symmetrize_max
    from pygcn_tpu.ops.spmm import spmm
    from pygcn_tpu.parallel.partition import build_dist_plan, locality_order

    adj = sym_normalize(symmetrize_max(
        community_graph(1024, 12.0, community_size=64, seed=0, shuffle=True)
    ))
    g0 = Graph.from_scipy(adj, is_symmetric=True, build_dense=False,
                          build_bcsr=False, build_ell=False)
    perm = locality_order(g0, "lp")
    adj_lp = adj.tocsr()[perm][:, perm].tocoo()
    g = Graph.from_scipy(adj_lp, is_symmetric=True, build_dense=False,
                         build_bcsr=False, build_hybrid=True,
                         hybrid_min_edges_per_tile=32)
    assert g.hybrid is not None and g.hybrid.tile_edges > 0

    x = jnp.asarray(np.random.default_rng(0).normal(size=(g.n_nodes, 16))
                    .astype(np.float32))
    dense = adj_lp.toarray() @ np.asarray(x)
    np.testing.assert_allclose(np.asarray(spmm(g, x, impl="hybrid")), dense,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(spmm(Graph.from_scipy(adj_lp, is_symmetric=True,
                                         build_dense=False, build_bcsr=False),
                        x, impl="ell")),
        dense, rtol=2e-4, atol=2e-4,
    )
    # the partitioner handles the same ordered graph
    plan = build_dist_plan(g0, 4)
    assert plan.n_shards == 4


def test_reddit_config_tiny():
    """Reddit-shaped sampled training: dense-neighborhood synthetic graph
    (avg degree ~60 at 1.5K nodes, the hub-heavy regime), fanouts [25, 10]."""
    from pygcn_tpu.apps import train_sampled

    acc = train_sampled.main([
        "--n_nodes", "1500", "--avg_degree", "60.0", "--feat_dim", "32",
        "--n_classes", "8", "--fanouts", "25", "10", "--batch_size", "128",
        "--epochs", "1", "--prefetch", "0",
    ])
    assert 0.0 <= acc <= 1.0
