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


def test_dist_checkpoint_roundtrip(tmp_path):
    """Sharded training state checkpoints to host .npz and reshard-restores."""
    from pygcn_tpu.train import get_checkpoint_state, save_checkpoint_state

    data = sbm_classification(
        n=120, n_classes=3, feat_dim=12, seed=4,
        build_dense=False, build_bcsr=False, build_ell=False,
    )
    mesh = make_mesh([4], ["graph"])
    plan = build_dist_plan(data.graph, 4)
    model = DistGCN(mesh, plan, [12, 8, 3])
    tx = adam_l2(0.01)
    params = model.shard_params(model.init(jax.random.key(0)))
    opt_state = tx.init(params)
    step = make_dist_classifier_step(model, tx)

    npad = plan.n_nodes_padded
    x = model.shard_x(data.features)
    labels = jnp.zeros(npad, jnp.int32).at[: data.graph.n_nodes].set(
        jnp.asarray(data.labels))
    mask = jnp.pad(bool_mask(data.idx_train, data.graph.n_nodes),
                   (0, npad - data.graph.n_nodes))
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, x, labels, mask)

    path = str(tmp_path / "dist_ckpt.pkl")
    save_checkpoint_state(params, 3, opt_state, {"lr": 0.01}, path)
    r_params, epoch, r_opt, sched = get_checkpoint_state(path)
    assert epoch == 3 and sched == {"lr": 0.01}

    # restored (host) state reshard-resumes and matches the live state's step
    r_params = model.shard_params(r_params)
    r_opt = jax.device_put(r_opt, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    p1, _, l1 = step(params, opt_state, x, labels, mask)
    p2, _, l2 = step(r_params, r_opt, x, labels, mask)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6),
        p1, p2,
    )


def test_dist_evaluator_2d_mesh_matches_single_device():
    """GCNOverMLP on a 2-D graph×data mesh == the single-device model."""
    import scipy.sparse as sp

    from pygcn_tpu.graph.graph import Graph
    from pygcn_tpu.graph.transform import sym_normalize, symmetrize_max
    from pygcn_tpu.nn.models import GCNOverMLP
    from pygcn_tpu.parallel.dist_evaluator import (
        DistGCNOverMLP,
        make_dist_evaluator_step,
    )

    rng = np.random.default_rng(0)
    n, batch, feat, dt, hid = 120, 4, 9, 8, 12
    adj = sym_normalize(symmetrize_max(
        sp.random(n, n, density=0.06, random_state=0, format="coo")
    ))
    graph = Graph.from_scipy(adj, is_symmetric=True, build_dense=True,
                             build_bcsr=False, build_ell=False)

    kw = dict(gcn_nfeat=dt, gcn_nhid=hid, gcn_nclass=hid, dim_touched=dt,
              linear_nin=hid + (feat - dt) - 1, linear_nhid1=16,
              linear_nhid2=8, linear_nout=1)
    single = GCNOverMLP(**kw)
    params = single.init(jax.random.key(3))

    x = rng.normal(size=(batch, n, feat)).astype(np.float32)
    flags = np.zeros((batch, n), np.float32)
    for i in range(batch):
        flags[i, rng.choice(n, 10, replace=False)] = 1.0
    x[:, :, -1] = flags

    want = np.asarray(single.apply(params, jnp.asarray(x), graph))

    mesh = make_mesh([2, 2], ["graph", "data"])
    plan = build_dist_plan(graph, 2)
    dist = DistGCNOverMLP(mesh, plan, **kw)
    got = np.asarray(dist.apply(dist.shard_params(params), dist.shard_batch(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # and the fused 2-D train step runs, reduces grads, stays finite
    tx = adam_l2(0.01, 5e-4)
    sp_params = dist.shard_params(params)
    opt_state = tx.init(sp_params)
    step = make_dist_evaluator_step(dist, tx)
    y = dist.shard_targets(rng.normal(size=(batch,)).astype(np.float32))
    bx = dist.shard_batch(x)
    for _ in range(3):
        sp_params, opt_state, loss = step(sp_params, opt_state, bx, y)
    assert np.isfinite(float(loss))


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
