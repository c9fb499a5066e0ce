"""Distributed GAT (halo-exchange attention) on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from pygcn_tpu.graph.datasets import sbm_classification
from pygcn_tpu.nn.gat import GAT
from pygcn_tpu.parallel import build_dist_plan, make_mesh
from pygcn_tpu.parallel.dist_gat import DistGAT
from pygcn_tpu.parallel.dist_gcn import make_dist_classifier_step
from pygcn_tpu.train import adam_l2
from pygcn_tpu.train.loop import bool_mask


def _data(n=160):
    return sbm_classification(
        n=n, n_classes=3, feat_dim=12, seed=4,
        train_per_class=10, n_val=24, n_test=48,
        build_dense=False, build_bcsr=False, build_ell=False,
    )


def test_dist_gat_matches_single_device():
    """4-shard DistGAT forward == single-device GAT with the same params."""
    data = _data()
    mesh = make_mesh([4], ["graph"])
    plan = build_dist_plan(data.graph, 4)
    dist = DistGAT(mesh, plan, nfeat=12, nhid=5, nclass=3, heads=2)

    single = GAT(nfeat=12, nhid=5, nclass=3, heads=2)
    params = single.init(jax.random.key(7))
    # identical parameter pytrees ({gat1: {w, a_src, a_dst, b}, gat2: ...})
    assert jax.tree.structure(params) == jax.tree.structure(dist.init(jax.random.key(0)))

    x = jnp.asarray(data.features)
    want = np.asarray(single.apply(params, x, data.graph))
    got = np.asarray(dist.apply(dist.shard_params(params), dist.shard_x(x)))
    np.testing.assert_allclose(
        got[: data.graph.n_nodes], want, rtol=5e-4, atol=5e-4
    )


def test_dist_gat_trains():
    data = _data()
    mesh = make_mesh([4], ["graph"])
    plan = build_dist_plan(data.graph, 4)
    model = DistGAT(mesh, plan, nfeat=12, nhid=5, nclass=3, heads=2)
    params = model.shard_params(model.init(jax.random.key(0)))
    tx = adam_l2(0.01, 5e-4)
    opt_state = tx.init(params)
    step = make_dist_classifier_step(model, tx)

    npad = plan.n_nodes_padded
    x = model.shard_x(data.features)
    labels = jnp.zeros(npad, jnp.int32).at[: data.graph.n_nodes].set(
        jnp.asarray(data.labels)
    )
    mask = jnp.pad(
        bool_mask(data.idx_train, data.graph.n_nodes),
        (0, npad - data.graph.n_nodes),
    )
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state, x, labels, mask)
    assert np.isfinite(float(loss))
    logp = np.asarray(model.apply(params, x))[: data.graph.n_nodes]
    acc = (logp.argmax(1)[data.idx_test]
           == np.asarray(data.labels)[data.idx_test]).mean()
    assert acc > 0.7, acc


def test_dist_gatv2_matches_single_device():
    """4-shard DistGAT(v2) forward == single-device GAT(v2=True)."""
    data = _data()
    mesh = make_mesh([4], ["graph"])
    plan = build_dist_plan(data.graph, 4)
    dist = DistGAT(mesh, plan, nfeat=12, nhid=5, nclass=3, heads=2, v2=True)

    single = GAT(nfeat=12, nhid=5, nclass=3, heads=2, v2=True)
    params = single.init(jax.random.key(7))
    dp = dist.init(jax.random.key(0))
    # same keys per layer ({w_l, w_r, a, b}); single-device GATv2Conv params
    # drop nothing, so the pytrees interchange
    assert sorted(dp["gat1"].keys()) == sorted(params["gat1"].keys())

    x = jnp.asarray(data.features)
    want = np.asarray(single.apply(params, x, data.graph))
    got = np.asarray(dist.apply(dist.shard_params(params), dist.shard_x(x)))
    np.testing.assert_allclose(
        got[: data.graph.n_nodes], want, rtol=5e-4, atol=5e-4
    )


def test_dist_gatv2_trains():
    data = _data()
    mesh = make_mesh([4], ["graph"])
    plan = build_dist_plan(data.graph, 4)
    model = DistGAT(mesh, plan, nfeat=12, nhid=5, nclass=3, heads=2, v2=True)
    params = model.shard_params(model.init(jax.random.key(0)))
    tx = adam_l2(0.01, 5e-4)
    opt_state = tx.init(params)
    step = make_dist_classifier_step(model, tx)

    npad = plan.n_nodes_padded
    x = model.shard_x(data.features)
    labels = jnp.zeros(npad, jnp.int32).at[: data.graph.n_nodes].set(
        jnp.asarray(data.labels)
    )
    mask = jnp.pad(
        bool_mask(data.idx_train, data.graph.n_nodes),
        (0, npad - data.graph.n_nodes),
    )
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state, x, labels, mask)
    assert np.isfinite(float(loss))
    logp = np.asarray(model.apply(params, x))[: data.graph.n_nodes]
    acc = (logp.argmax(1)[data.idx_test]
           == np.asarray(data.labels)[data.idx_test]).mean()
    assert acc > 0.7, acc
