"""Distributed SAGE / APPNP (halo-exchange) on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from pygcn_tpu.graph.datasets import sbm_classification
from pygcn_tpu.nn.gin import APPNP
from pygcn_tpu.nn.sage import SAGE
from pygcn_tpu.parallel import build_dist_plan, make_mesh
from pygcn_tpu.parallel.dist_gcn import make_dist_classifier_step
from pygcn_tpu.parallel.dist_sage import DistAPPNP, DistSAGE
from pygcn_tpu.train import adam_l2
from pygcn_tpu.train.loop import bool_mask


def _data(n=160, adj_norm="sym"):
    return sbm_classification(
        n=n, n_classes=3, feat_dim=12, seed=4,
        train_per_class=10, n_val=24, n_test=48, adj_norm=adj_norm,
        build_dense=False, build_bcsr=False, build_ell=False,
    )


def test_dist_sage_matches_single_device():
    """4-shard DistSAGE forward == single-device SAGE with the same params."""
    data = _data(adj_norm="row")
    mesh = make_mesh([4], ["graph"])
    plan = build_dist_plan(data.graph, 4)
    dist = DistSAGE(mesh, plan, nfeat=12, nhid=8, nclass=3)

    single = SAGE(12, 8, 3)
    params = single.init(jax.random.key(7))
    assert jax.tree.structure(params) == jax.tree.structure(dist.init(jax.random.key(0)))

    x = jnp.asarray(data.features)
    want = np.asarray(single.apply(params, x, data.graph))
    got = np.asarray(dist.apply(dist.shard_params(params), dist.shard_x(x)))
    np.testing.assert_allclose(got[: data.graph.n_nodes], want, rtol=5e-4, atol=5e-4)


def test_dist_appnp_matches_single_device():
    data = _data(adj_norm="sym")
    mesh = make_mesh([4], ["graph"])
    plan = build_dist_plan(data.graph, 4)
    dist = DistAPPNP(mesh, plan, nfeat=12, nhid=8, nclass=3, k=6, alpha=0.15)

    single = APPNP(12, 8, 3, k=6, alpha=0.15)
    params = single.init(jax.random.key(3))
    assert jax.tree.structure(params) == jax.tree.structure(dist.init(jax.random.key(0)))

    x = jnp.asarray(data.features)
    want = np.asarray(single.apply(params, x, data.graph))
    got = np.asarray(dist.apply(dist.shard_params(params), dist.shard_x(x)))
    np.testing.assert_allclose(got[: data.graph.n_nodes], want, rtol=5e-4, atol=5e-4)


def test_dist_sage_and_appnp_train():
    data = _data()
    mesh = make_mesh([4], ["graph"])
    plan = build_dist_plan(data.graph, 4)
    npad = plan.n_nodes_padded
    labels = jnp.zeros(npad, jnp.int32).at[: data.graph.n_nodes].set(
        jnp.asarray(data.labels)
    )
    mask = jnp.pad(
        bool_mask(data.idx_train, data.graph.n_nodes),
        (0, npad - data.graph.n_nodes),
    )
    tx = adam_l2(0.01, 5e-4)

    for model in (
        DistSAGE(mesh, plan, nfeat=12, nhid=8, nclass=3),
        DistAPPNP(mesh, plan, nfeat=12, nhid=8, nclass=3, k=4),
    ):
        params = model.shard_params(model.init(jax.random.key(0)))
        opt_state = tx.init(params)
        step = make_dist_classifier_step(model, tx)
        x = model.shard_x(data.features)
        for _ in range(60):
            params, opt_state, loss = step(params, opt_state, x, labels, mask)
        assert np.isfinite(float(loss))
        preds = np.asarray(model.apply(params, x)).argmax(1)[: data.graph.n_nodes]
        acc = (preds[data.idx_test] == np.asarray(data.labels)[data.idx_test]).mean()
        assert acc > 0.7, (type(model).__name__, acc)
