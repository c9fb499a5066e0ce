"""Golden-value parity tests: our layers vs the reference math built in torch.

Each test constructs the reference computation independently in PyTorch (CPU),
loads identical parameters into both, and checks activations (and where
relevant, gradients) allclose. This implements the BASELINE requirement of
per-layer allclose against the reference GCN.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import torch
import torch.nn.functional as F

from pygcn_tpu.graph import Graph, sym_normalize, symmetrize_max
from pygcn_tpu.nn import (
    GCN3,
    GCNOverMLP,
    GraphConv,
    MLP3,
    batch_standardize,
    masked_mean_pool,
)
from pygcn_tpu.nn.models import topk_flag_straight_through

torch.manual_seed(0)
torch.set_num_threads(1)


def make_graph(n=90, e=700, seed=3):
    rng = np.random.default_rng(seed)
    m = sp.coo_matrix(
        (rng.uniform(0.1, 1.0, e), (rng.integers(0, n, e), rng.integers(0, n, e))),
        shape=(n, n),
    )
    a = sym_normalize(symmetrize_max(m))
    g = Graph.from_scipy(a, is_symmetric=True, build_dense=True)
    return g, torch.tensor(a.toarray(), dtype=torch.float32)


def torch_gcn_layer(x, adj, w, b):
    """Reference GraphConvolution.forward math (pygcn/layers.py:32-38)."""
    support = torch.mm(x, w)
    out = torch.spmm(adj, support)
    return out + b


def fresh_bn(x):
    """Reference apply_bn quirk (pygcn/models.py:41-45): fresh BatchNorm1d."""
    bn = torch.nn.BatchNorm1d(x.size()[1])
    return bn(x)


def test_graphconv_forward_parity():
    g, adj_t = make_graph()
    layer = GraphConv(12, 8)
    params = layer.init(jax.random.key(0))
    x = np.random.default_rng(0).normal(size=(g.n_nodes, 12)).astype(np.float32)

    ours = layer(params, jnp.asarray(x), g)
    theirs = torch_gcn_layer(
        torch.tensor(x),
        adj_t,
        torch.tensor(np.asarray(params["w"])),
        torch.tensor(np.asarray(params["b"])),
    )
    np.testing.assert_allclose(
        np.asarray(ours), theirs.detach().numpy(), rtol=1e-4, atol=1e-5
    )


def test_batch_standardize_matches_fresh_batchnorm():
    x = np.random.default_rng(1).normal(size=(50, 7)).astype(np.float32) * 3 + 1
    ours = batch_standardize(jnp.asarray(x))
    theirs = fresh_bn(torch.tensor(x))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.detach().numpy(), rtol=1e-3, atol=1e-4
    )


def test_gcn3_forward_parity():
    """Full 3-layer GCN stack: bs(relu(gc1)) → bs(relu(gc2)) → relu(gc3)."""
    g, adj_t = make_graph()
    model = GCN3(nfeat=6, nhid=16, nclass=4)
    params = model.init(jax.random.key(1))
    x = np.random.default_rng(2).normal(size=(g.n_nodes, 6)).astype(np.float32)

    ours = model(params, jnp.asarray(x), g)

    h = torch.tensor(x)
    for name in ("gc1", "gc2"):
        w = torch.tensor(np.asarray(params[name]["w"]))
        b = torch.tensor(np.asarray(params[name]["b"]))
        h = fresh_bn(F.relu(torch_gcn_layer(h, adj_t, w, b)))
    w = torch.tensor(np.asarray(params["gc3"]["w"]))
    b = torch.tensor(np.asarray(params["gc3"]["b"]))
    h = F.relu(torch_gcn_layer(h, adj_t, w, b))

    np.testing.assert_allclose(
        np.asarray(ours), h.detach().numpy(), rtol=1e-3, atol=1e-4
    )


def test_mlp3_forward_parity():
    mlp = MLP3(10, 32, 8, 1)
    params = mlp.init(jax.random.key(2))
    x = np.random.default_rng(3).normal(size=(20, 10)).astype(np.float32)

    ours = mlp(params, jnp.asarray(x))

    h = torch.tensor(x)
    for i, name in enumerate(("linear1", "linear2", "linear3")):
        w = torch.tensor(np.asarray(params[name]["w"]))
        b = torch.tensor(np.asarray(params[name]["b"]))
        h = h @ w + b
        if i < 2:
            h = F.relu(h)
    np.testing.assert_allclose(
        np.asarray(ours), h.detach().numpy(), rtol=1e-4, atol=1e-5
    )


def test_masked_mean_pool_parity():
    """Reference PoolLayer (pygcn/models.py:271-286)."""
    rng = np.random.default_rng(4)
    b, n, f = 3, 40, 6
    x = rng.normal(size=(b, n, f)).astype(np.float32)
    flag = np.zeros((b, n), np.float32)
    for i in range(b):
        flag[i, rng.choice(n, 5, replace=False)] = 1.0
    x[:, :, -1] = flag

    ours = jax.vmap(masked_mean_pool)(jnp.asarray(x))

    xt = torch.tensor(x)
    masked = ((xt.T) * (xt[:, :, -1].T)).T
    count = len(torch.nonzero(xt[0, :, -1], as_tuple=True)[0])
    theirs = torch.sum(masked[:, :, :-1], axis=1) / count

    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-5, atol=1e-6)


def test_topk_flag_values_and_grads():
    rng = np.random.default_rng(5)
    scores = jnp.asarray(rng.uniform(0.5, 2.0, size=(30, 1)).astype(np.float32))
    nn_select = 7
    flag = topk_flag_straight_through(scores, nn_select)
    flag_np = np.asarray(flag)[:, 0]
    # exactly nn_select entries ~1, rest 0
    assert (np.isclose(flag_np, 1.0, atol=1e-5).sum()) == nn_select
    assert np.all((np.isclose(flag_np, 1.0, atol=1e-5)) | (flag_np == 0.0))
    # gradient = 1/score on selected entries (straight-through reciprocal)
    grads = jax.grad(lambda s: topk_flag_straight_through(s, nn_select).sum())(scores)
    sel = np.isclose(flag_np, 1.0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(grads)[sel, 0], 1.0 / np.asarray(scores)[sel, 0], rtol=1e-5
    )
    assert np.all(np.asarray(grads)[~sel, 0] == 0.0)


def test_gcn_over_mlp_matches_torch_per_sample_loop():
    """The vmapped evaluator equals the reference's per-sample loop
    (pygcn/models.py:343-355)."""
    g, adj_t = make_graph(n=60, e=400)
    b, n, f = 4, g.n_nodes, 9
    dim_touched = 6
    rng = np.random.default_rng(6)
    x = rng.normal(size=(b, n, f)).astype(np.float32)
    flag = np.zeros((b, n), np.float32)
    for i in range(b):
        flag[i, rng.choice(n, 8, replace=False)] = 1.0
    x[:, :, -1] = flag

    gcn_nclass = 5
    pooled_dim = gcn_nclass + (f - dim_touched) - 1
    model = GCNOverMLP(
        gcn_nfeat=dim_touched, gcn_nhid=12, gcn_nclass=gcn_nclass,
        dim_touched=dim_touched, linear_nin=pooled_dim,
        linear_nhid1=16, linear_nhid2=8, linear_nout=1,
    )
    params = model.init(jax.random.key(3))
    ours = model(params, jnp.asarray(x), g)

    # torch reference loop
    def torch_gcn3(xi):
        h = xi
        for name in ("gc1", "gc2"):
            w = torch.tensor(np.asarray(params["gcn"][name]["w"]))
            bb = torch.tensor(np.asarray(params["gcn"][name]["b"]))
            h = fresh_bn(F.relu(torch_gcn_layer(h, adj_t, w, bb)))
        w = torch.tensor(np.asarray(params["gcn"]["gc3"]["w"]))
        bb = torch.tensor(np.asarray(params["gcn"]["gc3"]["b"]))
        return F.relu(torch_gcn_layer(h, adj_t, w, bb))

    xt = torch.tensor(x)
    outs = []
    for i in range(b):
        gout = torch_gcn3(xt[i, :, :dim_touched])
        outs.append(torch.cat([gout, xt[i, :, dim_touched:]], dim=1))
    allg = torch.stack(outs)
    masked = ((allg.T) * (allg[:, :, -1].T)).T
    count = len(torch.nonzero(allg[0, :, -1], as_tuple=True)[0])
    pooled = torch.sum(masked[:, :, :-1], axis=1) / count
    h = pooled
    for i, name in enumerate(("linear1", "linear2", "linear3")):
        w = torch.tensor(np.asarray(params["mlp"][name]["w"]))
        bb = torch.tensor(np.asarray(params["mlp"][name]["b"]))
        h = h @ w + bb
        if i < 2:
            h = F.relu(h)

    np.testing.assert_allclose(
        np.asarray(ours), h.detach().numpy(), rtol=2e-3, atol=1e-3
    )


def test_init_distribution_bounds():
    """Init bounds follow the (quirky) torch fan computation."""
    layer = GraphConv(64, 16)
    params = layer.init(jax.random.key(7))
    w = np.asarray(params["w"])
    bound = np.sqrt(6.0 / 16)  # torch reads fan from size(1)=out_features
    assert w.max() <= bound and w.min() >= -bound
    assert w.max() > 0.8 * bound  # actually fills the range
    b = np.asarray(params["b"])
    assert np.abs(b).max() <= 1.0 / np.sqrt(16)


def test_generator_mlp3_parity():
    """GeneratorMLPLayers: batch-standardize after ReLU on layers 1-2
    (pygcn/models.py:220-241)."""
    from pygcn_tpu.nn.layers import GeneratorMLP3

    mlp = GeneratorMLP3(6, 16, 8, 1)
    params = mlp.init(jax.random.key(10))
    x = np.random.default_rng(10).normal(size=(30, 6)).astype(np.float32)
    ours = mlp(params, jnp.asarray(x))

    h = torch.tensor(x)
    for i, name in enumerate(("linear1", "linear2", "linear3")):
        w = torch.tensor(np.asarray(params[name]["w"]))
        b = torch.tensor(np.asarray(params[name]["b"]))
        h = h @ w + b
        if i < 2:
            h = fresh_bn(F.relu(h))
    np.testing.assert_allclose(np.asarray(ours), h.detach().numpy(), rtol=2e-3, atol=1e-3)


def test_softmax_mlp3_parity():
    """SoftGeneratorMLP: final softmax over the NODE axis (dim=0)
    (pygcn/models.py:244-264)."""
    from pygcn_tpu.nn.layers import SoftmaxMLP3

    mlp = SoftmaxMLP3(6, 16, 8, 1)
    params = mlp.init(jax.random.key(11))
    x = np.random.default_rng(11).normal(size=(25, 6)).astype(np.float32)
    ours = np.asarray(mlp(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours.sum(axis=0), 1.0, rtol=1e-5)

    h = torch.tensor(x)
    for i, name in enumerate(("linear1", "linear2", "linear3")):
        w = torch.tensor(np.asarray(params[name]["w"]))
        b = torch.tensor(np.asarray(params[name]["b"]))
        h = h @ w + b
        if i < 2:
            h = fresh_bn(F.relu(h))
    theirs = F.softmax(h, dim=0)
    np.testing.assert_allclose(ours, theirs.detach().numpy(), rtol=2e-3, atol=1e-3)


def test_pool_key_and_attention_parity():
    """SoftGeneratorPoolMLP (mean-pool key, pygcn/models.py:289-312) +
    SoftGeneratorAttention (dot-product softmax, :316-329)."""
    from pygcn_tpu.nn.layers import PoolKeyMLP, attention_scores

    pool = PoolKeyMLP(8, 16, 8)
    params = pool.init(jax.random.key(12))
    x = np.random.default_rng(12).normal(size=(20, 8)).astype(np.float32)
    key_vec = pool(params, jnp.asarray(x))
    assert key_vec.shape == (1, 8)  # key dim == nin

    h = torch.mean(torch.tensor(x), dim=0).unsqueeze(0)
    for i, name in enumerate(("linear1", "linear2", "linear3")):
        w = torch.tensor(np.asarray(params[name]["w"]))
        b = torch.tensor(np.asarray(params[name]["b"]))
        h = h @ w + b
        if i < 2:
            h = F.relu(h)
    np.testing.assert_allclose(np.asarray(key_vec), h.detach().numpy(), rtol=1e-4, atol=1e-5)

    attn = attention_scores(key_vec, jnp.asarray(x))
    theirs = F.softmax(torch.mul(h, torch.tensor(x)).sum(dim=1), dim=0)
    np.testing.assert_allclose(np.asarray(attn), theirs.detach().numpy(), rtol=1e-4, atol=1e-5)
