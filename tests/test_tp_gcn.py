"""Tensor-parallel GCN (graph x model mesh) on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pygcn_tpu.graph.datasets import sbm_classification
from pygcn_tpu.parallel import build_dist_plan, make_mesh
from pygcn_tpu.parallel.dist_gcn import make_dist_classifier_step
from pygcn_tpu.parallel.tp_gcn import TPDistGCN
from pygcn_tpu.train import adam_l2
from pygcn_tpu.train.loop import bool_mask


def _dense_reference(data, params, modes):
    """Single-device forward with the dense adjacency (same math)."""
    a = data.graph.to_scipy().toarray()
    h = np.asarray(data.features, np.float64)
    for i, p in enumerate(params):
        h = a @ (h @ np.asarray(p["w"], np.float64)) + np.asarray(p["b"], np.float64)
        if i < len(params) - 1:
            h = np.maximum(h, 0)
    return h


@pytest.mark.parametrize(
    "mesh_shape,dims",
    [
        ((2, 2), [12, 8, 8, 3]),  # col, row, full — graph x model composed
        ((1, 4), [12, 8, 3]),     # col, rowfull — pure TP (Megatron pair)
        ((4, 2), [12, 8, 8, 8, 3]),  # col, row, col, rowfull
    ],
)
def test_tp_gcn_matches_single_device(mesh_shape, dims):
    data = sbm_classification(
        n=96, n_classes=3, feat_dim=dims[0], seed=3,
        build_dense=False, build_bcsr=False, build_ell=False,
    )
    g, m = mesh_shape
    mesh = make_mesh([g, m], ["graph", "model"])
    plan = build_dist_plan(data.graph, g)
    model = TPDistGCN(mesh, plan, dims)
    params = model.init(jax.random.key(2))

    got = np.asarray(model.apply(model.shard_params(params), model.shard_x(data.features)))
    want = _dense_reference(data, params, model.modes)
    np.testing.assert_allclose(
        got[: data.graph.n_nodes], want, rtol=5e-4, atol=5e-4
    )


def test_tp_gcn_rejects_indivisible_hidden():
    data = sbm_classification(
        n=64, n_classes=3, feat_dim=8, seed=0,
        build_dense=False, build_bcsr=False, build_ell=False,
    )
    mesh = make_mesh([2, 4], ["graph", "model"])
    plan = build_dist_plan(data.graph, 2)
    with pytest.raises(ValueError, match="not divisible"):
        TPDistGCN(mesh, plan, [8, 6, 3])  # hidden 6 % tp 4 != 0


def test_tp_gcn_trains_and_keeps_shardings():
    data = sbm_classification(
        n=160, n_classes=3, feat_dim=16, seed=1,
        train_per_class=10, n_val=30, n_test=60,
        build_dense=False, build_bcsr=False, build_ell=False,
    )
    mesh = make_mesh([2, 2], ["graph", "model"])
    plan = build_dist_plan(data.graph, 2)
    model = TPDistGCN(
        mesh, plan, [16, 8, 3],
        final_activation=lambda h: jax.nn.log_softmax(h, axis=1),
    )
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

    for _ in range(15):
        params, opt_state, loss = step(params, opt_state, x, labels, mask)
    assert np.isfinite(float(loss))

    # TP shardings survive the optimizer: the col layer's weight stays
    # sharded over "model" (no silent gather-to-replicated)
    w0_spec = params[0]["w"].sharding.spec
    assert "model" in jax.tree.leaves(tuple(w0_spec)), w0_spec

    logp = model.apply(params, x)
    preds = np.asarray(logp).argmax(1)[: data.graph.n_nodes]
    acc = (preds[data.idx_test] == np.asarray(data.labels)[data.idx_test]).mean()
    assert acc > 0.7, acc
