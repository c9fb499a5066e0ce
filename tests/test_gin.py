"""GIN / APPNP layers vs dense references; both learn SBM."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pygcn_tpu.graph.datasets import sbm_classification
from pygcn_tpu.graph.graph import Graph
from pygcn_tpu.graph.transform import symmetrize_max, sym_normalize
from pygcn_tpu.nn.gin import APPNP, GIN, GINConv, appnp_propagate
from pygcn_tpu.train import adam_l2


def test_ginconv_matches_dense():
    import scipy.sparse as sp

    m = symmetrize_max(
        sp.random(50, 50, density=0.1, random_state=0, format="coo")
    )
    g = Graph.from_scipy(m, build_dense=False, build_bcsr=False, build_ell=False)
    layer = GINConv(6, 4)
    params = layer.init(jax.random.key(0))
    params = {**params, "eps": jnp.asarray(0.3)}  # nonzero eps so the term matters
    rng = np.random.default_rng(0)
    x = rng.normal(size=(50, 6)).astype(np.float32)

    got = np.asarray(layer.apply(params, jnp.asarray(x), g))
    agg = m.toarray() @ x + 1.3 * x
    h = np.maximum(agg @ np.asarray(params["mlp"]["w1"]) + np.asarray(params["mlp"]["b1"]), 0)
    want = h @ np.asarray(params["mlp"]["w2"]) + np.asarray(params["mlp"]["b2"])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_appnp_propagate_matches_dense_iteration():
    import scipy.sparse as sp

    m = sym_normalize(symmetrize_max(
        sp.random(40, 40, density=0.15, random_state=1, format="coo")
    ))
    g = Graph.from_scipy(m, build_dense=False, build_bcsr=False, build_ell=False)
    rng = np.random.default_rng(1)
    h = rng.normal(size=(40, 5)).astype(np.float32)

    got = np.asarray(appnp_propagate(g, jnp.asarray(h), k=4, alpha=0.15))
    a = m.toarray()
    z = h.copy()
    for _ in range(4):
        z = 0.85 * (a @ z) + 0.15 * h
    np.testing.assert_allclose(got, z, rtol=5e-4, atol=5e-5)


def test_gin_and_appnp_learn_sbm():
    data = sbm_classification(
        n=200, n_classes=3, feat_dim=16, seed=0,
        train_per_class=12, n_val=30, n_test=60, adj_norm="sym",
        build_dense=False, build_bcsr=False, build_ell=False,
    )
    x = jnp.asarray(data.features)
    labels = jnp.asarray(data.labels)
    mask = jnp.zeros(200).at[jnp.asarray(data.idx_train)].set(1.0)

    def nll(logp):
        per = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
        return (per * mask).sum() / mask.sum()

    def train(model, key, n_steps):
        tx = adam_l2(0.01, 5e-4)
        params = model.init(key)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state):
            loss, grads = jax.value_and_grad(
                lambda p: nll(model.apply(p, x, data.graph))
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        for _ in range(n_steps):
            params, opt_state, _ = step(params, opt_state)
        preds = np.asarray(model.apply(params, x, data.graph)).argmax(1)
        return (preds[data.idx_test] == np.asarray(data.labels)[data.idx_test]).mean()

    acc = train(GIN(16, 16, 3), jax.random.key(0), 80)
    assert acc > 0.75, f"GIN {acc}"

    acc = train(APPNP(16, 16, 3, k=8, alpha=0.1), jax.random.key(1), 80)
    assert acc > 0.75, f"APPNP {acc}"


def test_factory_builds_gin_and_appnp():
    from pygcn_tpu.nn.models import get_model
    from pygcn_tpu.utils.config import Config

    cfg = Config(gcn_nfeat=16, gcn_nhid=8, gcn_nclass=3)
    for name, cls in (("GIN", GIN), ("APPNP", APPNP)):
        m = get_model(cfg, name)
        assert isinstance(m, cls)
