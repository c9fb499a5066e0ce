"""Distributed GCN end-to-end on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from pygcn_tpu.graph.datasets import sbm_classification
from pygcn_tpu.parallel import build_dist_plan, make_mesh
from pygcn_tpu.parallel.dist_gcn import DistGCN, make_dist_classifier_step
from pygcn_tpu.train import adam_l2
from pygcn_tpu.train.loop import bool_mask


def test_dist_gcn_trains_and_matches_accuracy():
    data = sbm_classification(
        n=400, n_classes=3, feat_dim=48, seed=1,
        build_dense=False, build_bcsr=False, build_ell=False,
    )
    mesh = make_mesh([4], ["graph"])
    plan = build_dist_plan(data.graph, 4)
    model = DistGCN(mesh, plan, [48, 16, 3], final_activation=lambda h: jax.nn.log_softmax(h, axis=1))

    params = model.shard_params(model.init(jax.random.key(0)))
    tx = adam_l2(0.01, 5e-4)
    opt_state = tx.init(params)
    step = make_dist_classifier_step(model, tx)

    npad = plan.n_nodes_padded
    x = model.shard_x(data.features)
    labels = jnp.zeros(npad, jnp.int32).at[: data.graph.n_nodes].set(jnp.asarray(data.labels))
    mask = jnp.pad(bool_mask(data.idx_train, data.graph.n_nodes), (0, npad - data.graph.n_nodes))

    for _ in range(100):
        params, opt_state, loss = step(params, opt_state, x, labels, mask)
    assert np.isfinite(float(loss))

    logp = model.apply(params, x)
    preds = np.asarray(logp).argmax(1)[: data.graph.n_nodes]
    acc = (preds[data.idx_test] == np.asarray(data.labels)[data.idx_test]).mean()
    assert acc > 0.75, acc


def test_dist_gcn_matches_single_device():
    """Distributed forward == single-device forward with the same params."""
    data = sbm_classification(
        n=200, n_classes=3, feat_dim=24, seed=2,
        build_dense=True, build_bcsr=False, build_ell=False,
    )
    mesh = make_mesh([4], ["graph"])
    plan = build_dist_plan(data.graph, 4)
    model = DistGCN(mesh, plan, [24, 8, 3])
    params = model.init(jax.random.key(1))

    x = jnp.asarray(data.features)
    dist_out = model.apply(model.shard_params(params), model.shard_x(x))

    # single-device reference with the dense adjacency
    a = np.asarray(data.graph.dense)
    h = np.asarray(x)
    for i, p in enumerate(params):
        h = a @ (h @ np.asarray(p["w"])) + np.asarray(p["b"])
        if i < len(params) - 1:
            h = np.maximum(h, 0)

    np.testing.assert_allclose(
        np.asarray(dist_out)[: data.graph.n_nodes], h, rtol=5e-4, atol=5e-4
    )
