"""Distributed SpMM on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from pygcn_tpu.graph import Graph, sym_normalize, symmetrize_max
from pygcn_tpu.parallel import build_dist_plan, make_dist_spmm, make_mesh
from pygcn_tpu.parallel.dist_spmm import pad_node_features, shard_features


def make_case(n=500, e=4000, seed=0):
    rng = np.random.default_rng(seed)
    m = sp.coo_matrix(
        (rng.uniform(0.1, 1.0, e), (rng.integers(0, n, e), rng.integers(0, n, e))),
        shape=(n, n),
    )
    a = sym_normalize(symmetrize_max(m))
    g = Graph.from_scipy(a, is_symmetric=True, build_dense=False, build_bcsr=False)
    return g, a.toarray()


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_dist_spmm_matches_dense(n_shards):
    g, a = make_case()
    mesh = make_mesh([n_shards], ["graph"])
    plan = build_dist_plan(g, n_shards)
    dist_spmm = make_dist_spmm(mesh, plan)

    x = np.random.default_rng(1).normal(size=(g.n_nodes, 32)).astype(np.float32)
    xp = shard_features(pad_node_features(jnp.asarray(x), plan), mesh)
    y = jax.jit(dist_spmm)(xp)
    np.testing.assert_allclose(
        np.asarray(y)[: g.n_nodes], a @ x, rtol=2e-4, atol=2e-4
    )
    # padded rows stay zero
    assert np.all(np.asarray(y)[g.n_nodes :] == 0)


def test_dist_spmm_gradient():
    g, a = make_case(n=200, e=1500)
    mesh = make_mesh([4], ["graph"])
    plan = build_dist_plan(g, 4)
    dist_spmm = make_dist_spmm(mesh, plan)

    x = np.random.default_rng(2).normal(size=(plan.n_nodes_padded, 8)).astype(np.float32)
    ct = np.random.default_rng(3).normal(size=(plan.n_nodes_padded, 8)).astype(np.float32)
    ct[g.n_nodes :] = 0

    def f(x):
        return jnp.vdot(jnp.asarray(ct), dist_spmm(x))

    dx = jax.jit(jax.grad(f))(shard_features(jnp.asarray(x), mesh))
    expected = a.T @ ct[: g.n_nodes]
    np.testing.assert_allclose(
        np.asarray(dx)[: g.n_nodes], expected, rtol=2e-4, atol=2e-4
    )


def test_plan_halo_only_boundary_nodes():
    """The halo plan ships each needed boundary row once, not per-edge."""
    g, _ = make_case(n=400, e=6000)
    plan = build_dist_plan(g, 4)
    # every halo slot indexes within the shard
    assert int(plan.send_idx.max()) < plan.shard_size
    # remote-edge halo references stay within the halo table
    assert int(plan.rem_h.max()) < 4 * plan.halo
    # halo is bounded by shard size (dedup): can't exceed nodes per shard
    assert plan.halo <= plan.shard_size + 8


def test_locality_order_reduces_remote_edges():
    """BFS ordering cuts the halo on community-structured graphs."""
    from pygcn_tpu.graph.datasets import sbm_classification
    from pygcn_tpu.parallel.partition import locality_order, reorder_graph

    data = sbm_classification(
        n=400, n_classes=8, homophily=0.95, avg_degree=10, seed=0,
        build_dense=False, build_bcsr=False, build_ell=False,
    )
    g = data.graph

    def remote_fraction(graph):
        plan = build_dist_plan(graph, 4)
        return float(plan.rem_w.astype(bool).sum()) / graph.n_edges

    # scramble node ids to simulate arbitrary labeling
    rng = np.random.default_rng(1)
    scramble = rng.permutation(g.n_nodes)
    g_scrambled, _ = reorder_graph(g, scramble)
    base = remote_fraction(g_scrambled)

    perm = locality_order(g_scrambled, 'louvain')
    g_ordered, inv = reorder_graph(g_scrambled, perm)
    improved = remote_fraction(g_ordered)
    assert improved < base * 0.7, (base, improved)

    # reordering preserves the operator: A_new[inv][:, inv] == A_old
    a_old = g_scrambled.to_scipy().toarray()
    a_new = g_ordered.to_scipy().toarray()
    np.testing.assert_allclose(a_new[np.ix_(inv, inv)], a_old, rtol=1e-6)


def test_dist_spmm_parts_decomposition():
    """The 'local'/'halo' component builds (bench_scaling --halo_report cost
    attribution) sum exactly to the full distributed SpMM."""
    g, a = make_case()
    mesh = make_mesh([4], ["graph"])
    plan = build_dist_plan(g, 4)
    full = make_dist_spmm(mesh, plan)
    local = make_dist_spmm(mesh, plan, parts="local")
    halo = make_dist_spmm(mesh, plan, parts="halo")

    x = np.random.default_rng(2).normal(size=(g.n_nodes, 16)).astype(np.float32)
    xp = shard_features(pad_node_features(jnp.asarray(x), plan), mesh)
    y_full = np.asarray(jax.jit(full)(xp))
    y_sum = np.asarray(jax.jit(local)(xp)) + np.asarray(jax.jit(halo)(xp))
    np.testing.assert_allclose(y_full, y_sum, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(y_full[: g.n_nodes], a @ x, rtol=2e-4, atol=2e-4)

    with pytest.raises(ValueError, match="unknown parts"):
        make_dist_spmm(mesh, plan, parts="bogus")
