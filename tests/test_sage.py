"""GraphSAGE / SGC layers vs dense references; both learn SBM."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pygcn_tpu.graph.datasets import sbm_classification
from pygcn_tpu.graph.graph import Graph
from pygcn_tpu.graph.transform import row_normalize, symmetrize_max
from pygcn_tpu.nn.sage import SAGE, SAGEConv, SGC, sgc_propagate
from pygcn_tpu.train import adam_l2


def _data(adj_norm):
    return sbm_classification(
        n=200, n_classes=3, feat_dim=16, seed=0,
        train_per_class=12, n_val=30, n_test=60, adj_norm=adj_norm,
        build_dense=False, build_bcsr=False, build_ell=False,
    )


def test_sageconv_matches_dense():
    import scipy.sparse as sp

    m = row_normalize(symmetrize_max(
        sp.random(50, 50, density=0.1, random_state=0, format="coo")
    ))
    g = Graph.from_scipy(m, build_dense=False, build_bcsr=False, build_ell=False)
    layer = SAGEConv(6, 4)
    params = layer.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    x = rng.normal(size=(50, 6)).astype(np.float32)

    got = np.asarray(layer.apply(params, jnp.asarray(x), g))
    want = (x @ np.asarray(params["w_self"])
            + (m.toarray() @ x) @ np.asarray(params["w_nb"])
            + np.asarray(params["b"]))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_sgc_propagate_matches_dense_power():
    import scipy.sparse as sp

    from pygcn_tpu.graph.transform import sym_normalize

    m = sym_normalize(symmetrize_max(
        sp.random(40, 40, density=0.15, random_state=1, format="coo")
    ))
    g = Graph.from_scipy(m, build_dense=False, build_bcsr=False, build_ell=False)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(40, 5)).astype(np.float32)
    got = np.asarray(sgc_propagate(g, jnp.asarray(x), k=3))
    a = m.toarray()
    want = a @ (a @ (a @ x))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)


def _train(model_apply, params, tx, n_steps, loss_of):
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(n_steps):
        params, opt_state, loss = step(params, opt_state)
    return params, float(loss)


def test_sage_and_sgc_learn_sbm():
    data = _data("row")
    x = jnp.asarray(data.features)
    labels = jnp.asarray(data.labels)
    mask = jnp.zeros(200).at[jnp.asarray(data.idx_train)].set(1.0)

    def nll(logp):
        per = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
        return (per * mask).sum() / mask.sum()

    tx = adam_l2(0.01, 5e-4)

    sage = SAGE(16, 16, 3)
    sp_, loss = _train(
        sage.apply, sage.init(jax.random.key(0)), tx, 60,
        lambda p: nll(sage.apply(p, x, data.graph)),
    )
    preds = np.asarray(sage.apply(sp_, x, data.graph)).argmax(1)
    acc = (preds[data.idx_test] == np.asarray(data.labels)[data.idx_test]).mean()
    assert acc > 0.75, f"SAGE {acc}"

    data2 = _data("sym")
    xprop = sgc_propagate(data2.graph, jnp.asarray(data2.features), k=2)
    sgc = SGC(16, 3)
    labels2 = jnp.asarray(data2.labels)
    mask2 = jnp.zeros(200).at[jnp.asarray(data2.idx_train)].set(1.0)

    def nll2(logp):
        per = -jnp.take_along_axis(logp, labels2[:, None], axis=1)[:, 0]
        return (per * mask2).sum() / mask2.sum()

    sgp, _ = _train(
        sgc.apply, sgc.init(jax.random.key(1)), tx, 100,
        lambda p: nll2(sgc.apply(p, xprop)),
    )
    preds2 = np.asarray(sgc.apply(sgp, xprop)).argmax(1)
    acc2 = (preds2[data2.idx_test] == np.asarray(data2.labels)[data2.idx_test]).mean()
    assert acc2 > 0.75, f"SGC {acc2}"
