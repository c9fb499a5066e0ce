import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax
from scipy import stats

from pygcn_tpu.graph.datasets import sbm_classification, chung_lu_graph, load_planetoid
from pygcn_tpu.nn.models import KipfGCN
from pygcn_tpu.train import (
    EarlyStopping,
    ReduceLROnPlateau,
    adam_l2,
    get_checkpoint_state,
    save_checkpoint_state,
    spearman,
)
from pygcn_tpu.train.loop import bool_mask, make_classifier_steps
from pygcn_tpu.train.optim import get_learning_rate


def test_spearman_matches_scipy():
    rng = np.random.default_rng(0)
    for i in range(3):
        a = rng.normal(size=50).astype(np.float32)
        b = 0.5 * a + rng.normal(size=50).astype(np.float32)
        ours = float(spearman(jnp.asarray(a), jnp.asarray(b)))
        ref = stats.spearmanr(a, b).statistic
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_spearman_with_ties():
    a = np.array([1.0, 1.0, 2.0, 3.0, 3.0, 3.0], np.float32)
    b = np.array([2.0, 1.0, 4.0, 4.0, 5.0, 6.0], np.float32)
    ours = float(spearman(jnp.asarray(a), jnp.asarray(b)))
    ref = stats.spearmanr(a, b).statistic
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_adam_l2_matches_torch_adam():
    import torch

    torch.set_num_threads(1)
    w0 = np.random.default_rng(1).normal(size=(5, 3)).astype(np.float32)

    # torch: 5 steps of Adam with weight decay on a quadratic loss
    wt = torch.tensor(w0.copy(), requires_grad=True)
    opt = torch.optim.Adam([wt], lr=0.01, weight_decay=0.1)
    for _ in range(5):
        opt.zero_grad()
        loss = (wt**2).sum() * 0.5
        loss.backward()
        opt.step()

    # ours
    params = {"w": jnp.asarray(w0)}
    tx = adam_l2(0.01, weight_decay=0.1)
    state = tx.init(params)
    for _ in range(5):
        grads = jax.grad(lambda p: 0.5 * (p["w"] ** 2).sum())(params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), wt.detach().numpy(), rtol=1e-3, atol=1e-5
    )


def test_reduce_lr_on_plateau():
    params = {"w": jnp.zeros(3)}
    tx = adam_l2(0.1)
    state = tx.init(params)
    sched = ReduceLROnPlateau(mode="min", factor=0.5, patience=2)
    metrics = [1.0, 0.9, 0.9, 0.9, 0.9]  # stalls after epoch 1
    reduced_at = []
    for i, m in enumerate(metrics):
        state, reduced = sched.step(m, state)
        if reduced:
            reduced_at.append(i)
    assert reduced_at == [4]
    np.testing.assert_allclose(get_learning_rate(state), 0.05, rtol=1e-6)


def test_early_stopping():
    es = EarlyStopping(patience=3)
    losses = [1.0, 0.9, 0.95, 0.95, 0.95, 0.95]
    stops = [es(l) for l in losses]
    # patience=3: counter hits 3 on the third non-improving epoch (index 4)
    assert stops == [False, False, False, False, True, True]


def test_checkpoint_roundtrip():
    params = {"a": jnp.arange(3.0), "b": {"c": jnp.ones((2, 2))}}
    tx = adam_l2(0.01, weight_decay=0.1)
    opt_state = tx.init(params)
    sched = ReduceLROnPlateau()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.pkl")
        save_checkpoint_state(params, 7, opt_state, sched.state_dict(), path)
        p2, epoch, o2, s2 = get_checkpoint_state(path)
    assert epoch == 7
    np.testing.assert_allclose(np.asarray(p2["b"]["c"]), np.ones((2, 2)))
    sched.load_state_dict(s2)
    # restored opt state must be usable
    grads = jax.tree.map(jnp.ones_like, params)
    tx.update(grads, jax.tree.map(jnp.asarray, o2), params)


def test_end_to_end_node_classification():
    """Full stack: SBM data → KipfGCN → jitted train loop → >80% test acc."""
    data = sbm_classification(n=400, n_classes=3, feat_dim=48, seed=1)
    model = KipfGCN(nfeat=48, nhid=16, nclass=3, dropout=0.5)
    params = model.init(jax.random.key(0))
    tx = adam_l2(0.01, weight_decay=5e-4)
    opt_state = tx.init(params)

    train_step, eval_step = make_classifier_steps(model, tx, data.graph)
    x = jnp.asarray(data.features)
    y = jnp.asarray(data.labels)
    n = data.graph.n_nodes
    m_train = bool_mask(data.idx_train, n)
    m_val = bool_mask(data.idx_val, n)
    m_test = bool_mask(data.idx_test, n)

    rng = jax.random.key(42)
    for epoch in range(120):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = train_step(params, opt_state, x, y, m_train, sub)

    val_loss, val_acc = eval_step(params, x, y, m_val)
    test_loss, test_acc = eval_step(params, x, y, m_test)
    assert float(test_acc) >= 0.8, f"test acc {float(test_acc):.3f}"
    assert float(val_acc) >= 0.8, f"val acc {float(val_acc):.3f}"


def test_chung_lu_generator():
    g = chung_lu_graph(1000, 8.0, seed=0)
    assert g.shape == (1000, 1000)
    assert g.nnz > 4000
    degs = np.asarray(np.abs(g).sum(axis=1)).ravel()
    assert degs.max() > 10 * max(degs.mean(), 1)  # heavy tail


def test_expand_grid_and_run_sweep():
    from pygcn_tpu.train.sweep import expand_grid, run_sweep
    from pygcn_tpu.utils.config import Config

    cfg = Config(lr=[0.1, 0.01], hidden=[8, 16], fixed=3)
    assert cfg.has_list()
    grid = expand_grid(cfg)
    assert len(grid) == 4
    assert all(not c.has_list() for c in grid)
    assert {(c.lr, c.hidden) for c in grid} == {(0.1, 8), (0.1, 16), (0.01, 8), (0.01, 16)}
    assert all(c.fixed == 3 for c in grid)

    def trial(c):
        if c.lr == 0.1 and c.hidden == 16:
            raise RuntimeError("diverged")
        return {"score": c.lr * c.hidden}

    res = run_sweep(trial, cfg, metric="score", mode="max")
    assert len(res.records) == 4
    assert sum("error" in r for r in res.records) == 1
    assert res.best["params"] == {"lr": 0.1, "hidden": 8}
    assert res.best["metrics"]["score"] == 0.8  # 0.1*8 highest among survivors
    lo = run_sweep(trial, cfg, metric="score", mode="min")
    assert lo.best["metrics"]["score"] == 0.08


def test_expand_grid_no_lists_single_point():
    from pygcn_tpu.train.sweep import expand_grid
    from pygcn_tpu.utils.config import Config

    assert len(expand_grid(Config(lr=0.1))) == 1
