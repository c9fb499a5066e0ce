"""Colpanel GAT/GATv2 (ops/gat_colpanel) vs the exact COO attention path."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from pygcn_tpu.graph.graph import Graph
from pygcn_tpu.nn.gat import GATConv, GATv2Conv
from pygcn_tpu.ops.gat import attention_aggregate, gat_attention, gatv2_attention
from pygcn_tpu.ops.gat_colpanel import (
    check_gat_colpanel,
    gat_conv_colpanel,
    gatv2_conv_colpanel,
)

H, F = 2, 3


def _graph(n=60, density=0.12, seed=0):
    m = sp.random(n, n, density=density, random_state=seed, format="coo")
    m.data[:] = np.random.default_rng(seed).uniform(0.5, 1.5, m.nnz)
    g = Graph.from_scipy(
        m.astype(np.float32), build_dense=False, build_bcsr=False,
        build_ell=False, build_hybrid=False, build_colpanel=True,
        panel_width=16,  # force several panels (and >1 merge group is
    )  # exercised via the monkeypatched group size below)
    assert len(g.colpanel.panels) > 1
    return g


def _inputs(n, seed=1):
    k = jax.random.PRNGKey(seed)
    ks, kl, kr, ka, kb = jax.random.split(k, 5)
    return (
        jax.random.normal(ks, (n, H, F)),
        jax.random.normal(kl, (n, H, F)),
        jax.random.normal(ka, (H, F)),
        jax.random.normal(kb, (H, F)),
    )


def _ref_v1(g, s, a_src, a_dst):
    alpha = gat_attention(g, s, a_src, a_dst, 0.2)
    return attention_aggregate(g, s, alpha)


def test_gat_colpanel_matches_coo():
    g = _graph()
    s, _, a_src, a_dst = _inputs(g.n_nodes)
    out = gat_conv_colpanel(g, s, a_src, a_dst, 0.2)
    ref = _ref_v1(g, s, a_src, a_dst)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gat_colpanel_grads_match_coo():
    g = _graph(seed=3)
    s, _, a_src, a_dst = _inputs(g.n_nodes, seed=4)

    def loss(fn, s, asrc, adst):
        return jnp.sum(jnp.sin(fn(g, s, asrc, adst)))

    gc = jax.grad(lambda *a: loss(lambda g_, *b: gat_conv_colpanel(g_, *b, 0.2), *a),
                  argnums=(0, 1, 2))(s, a_src, a_dst)
    gr = jax.grad(lambda *a: loss(lambda g_, *b: _ref_v1(g_, *b), *a),
                  argnums=(0, 1, 2))(s, a_src, a_dst)
    for c, r in zip(gc, gr):
        np.testing.assert_allclose(np.asarray(c), np.asarray(r), atol=1e-5)


def test_gat_colpanel_chunked_and_grouped(monkeypatch):
    import pygcn_tpu.ops.gat_colpanel as gcp

    g = _graph(seed=5)
    s, _, a_src, a_dst = _inputs(g.n_nodes, seed=6)
    ref = gat_conv_colpanel(g, s, a_src, a_dst, 0.2)
    grad_ref = jax.grad(
        lambda v: jnp.sum(jnp.sin(gat_conv_colpanel(g, v, a_src, a_dst, 0.2)))
    )(s)
    # force the lax.map chunk path (rematerialized) AND per-panel combine
    # groups (the attention sweeps group by ATTN_GROUP_PANELS)
    monkeypatch.setattr(gcp, "ATTN_CHUNK_BUDGET_ELEMS", 64)
    out = gat_conv_colpanel(g, s, a_src, a_dst, 0.2, group_panels=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    grad = jax.grad(
        lambda v: jnp.sum(jnp.sin(
            gat_conv_colpanel(g, v, a_src, a_dst, 0.2, group_panels=1)))
    )(s)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(grad_ref), atol=1e-5)
    # unserialized schedule is numerically identical
    out2 = gat_conv_colpanel(g, s, a_src, a_dst, 0.2, serialize=False)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=1e-5)


def test_gat_colpanel_packed_logit_tables(monkeypatch):
    import pygcn_tpu.ops.gat_colpanel as gcp

    g = _graph(seed=21)
    s, _, a_src, a_dst = _inputs(g.n_nodes, seed=22)
    ref = gat_conv_colpanel(g, s, a_src, a_dst, 0.2)
    grad_ref = jax.grad(
        lambda v: jnp.sum(jnp.sin(gat_conv_colpanel(g, v, a_src, a_dst, 0.2)))
    )(s)
    monkeypatch.setattr(gcp, "PACK_LOGIT_TABLES", True)
    out = gat_conv_colpanel(g, s, a_src, a_dst, 0.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    grad = jax.grad(
        lambda v: jnp.sum(jnp.sin(gat_conv_colpanel(g, v, a_src, a_dst, 0.2)))
    )(s)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(grad_ref),
                               atol=1e-5)
    # chunked sum-sweep path under packing
    monkeypatch.setattr(gcp, "ATTN_CHUNK_BUDGET_ELEMS", 64)
    out2 = gat_conv_colpanel(g, s, a_src, a_dst, 0.2, group_panels=1)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=1e-5)


def test_gatv2_colpanel_matches_coo():
    g = _graph(seed=7)
    s_l, s_r, a, _ = _inputs(g.n_nodes, seed=8)
    out = gatv2_conv_colpanel(g, s_l, s_r, a, 0.2)
    alpha = gatv2_attention(g, s_l, s_r, a, 0.2)
    ref = attention_aggregate(g, s_l, alpha)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gatv2_colpanel_grads_match_coo():
    g = _graph(seed=17)
    s_l, s_r, a, _ = _inputs(g.n_nodes, seed=18)

    def _ref_v2(g_, sl, sr, aa):
        alpha = gatv2_attention(g_, sl, sr, aa, 0.2)
        return attention_aggregate(g_, sl, alpha)

    def loss(fn, sl, sr, aa):
        return jnp.sum(jnp.sin(fn(g, sl, sr, aa)))

    gc = jax.grad(
        lambda *x: loss(lambda g_, *b: gatv2_conv_colpanel(g_, *b, 0.2), *x),
        argnums=(0, 1, 2))(s_l, s_r, a)
    gr = jax.grad(lambda *x: loss(_ref_v2, *x), argnums=(0, 1, 2))(s_l, s_r, a)
    for c, r in zip(gc, gr):
        np.testing.assert_allclose(np.asarray(c), np.asarray(r), atol=1e-5)


def test_gatv2_colpanel_grads_chunked_and_grouped(monkeypatch):
    import pygcn_tpu.ops.gat_colpanel as gcp

    g = _graph(seed=19)
    s_l, s_r, a, _ = _inputs(g.n_nodes, seed=20)
    grad_ref = jax.grad(
        lambda v: jnp.sum(jnp.sin(gatv2_conv_colpanel(g, v, s_r, a, 0.2)))
    )(s_l)
    # force the backward's lax.scan chunk path AND per-panel groups
    monkeypatch.setattr(gcp, "ATTN_CHUNK_BUDGET_ELEMS", 64)
    grad = jax.grad(
        lambda v: jnp.sum(jnp.sin(
            gatv2_conv_colpanel(g, v, s_r, a, 0.2, group_panels=1)))
    )(s_l)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(grad_ref),
                               atol=1e-5)


def test_layers_colpanel_flag_matches_default():
    g = _graph(seed=9)
    n = g.n_nodes
    x = jax.random.normal(jax.random.PRNGKey(10), (n, 5))
    conv = GATConv(5, F, heads=H)
    p = conv.init(jax.random.PRNGKey(11))
    np.testing.assert_allclose(
        np.asarray(conv.apply(p, x, g, colpanel=True)),
        np.asarray(conv.apply(p, x, g)), atol=1e-5,
    )
    conv2 = GATv2Conv(5, F, heads=H)
    p2 = conv2.init(jax.random.PRNGKey(12))
    np.testing.assert_allclose(
        np.asarray(conv2.apply(p2, x, g, colpanel=True)),
        np.asarray(conv2.apply(p2, x, g)), atol=1e-5,
    )


def test_split_attention_step_matches_one_program():
    from pygcn_tpu.ops.gat_colpanel import split_attention_step

    g = _graph(seed=23)
    s, _, a_src, a_dst = _inputs(g.n_nodes, seed=24)
    pe = g.colpanel
    fwd, bwd = split_attention_step(0.2)
    out, aux = jax.jit(fwd)(pe, s, a_src, a_dst)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(gat_conv_colpanel(g, s, a_src, a_dst, 0.2)),
        atol=1e-5)
    ct = jnp.cos(out)  # d/dout of sum(sin(out))
    grads = jax.jit(bwd)(pe, s, a_src, a_dst, out, aux, ct)
    ref = jax.grad(
        lambda v: jnp.sum(jnp.sin(gat_conv_colpanel(g, v, a_src, a_dst, 0.2)))
    )(s)
    np.testing.assert_allclose(np.asarray(grads[0]), np.asarray(ref), atol=1e-5)

    fwd2, bwd2 = split_attention_step(0.2, v2=True)
    s_l, s_r, a, _ = _inputs(g.n_nodes, seed=25)
    out2, aux2 = jax.jit(fwd2)(pe, s_l, s_r, a)
    np.testing.assert_allclose(
        np.asarray(out2),
        np.asarray(gatv2_conv_colpanel(g, s_l, s_r, a, 0.2)), atol=1e-5)
    g2 = jax.jit(bwd2)(pe, s_l, s_r, a, out2, aux2, jnp.cos(out2))
    ref2 = jax.grad(
        lambda v: jnp.sum(jnp.sin(gatv2_conv_colpanel(g, v, s_r, a, 0.2)))
    )(s_l)
    np.testing.assert_allclose(np.asarray(g2[0]), np.asarray(ref2), atol=1e-5)


def test_attn_dropout_runs_and_masks():
    g = _graph(seed=13)
    s, _, a_src, a_dst = _inputs(g.n_nodes, seed=14)
    keys = jax.random.split(jax.random.PRNGKey(15), 2)

    def drop(i, arr):
        k = jax.random.fold_in(keys[i[0]], i[1])
        m = jax.random.bernoulli(k, 0.5, arr.shape)
        return jnp.where(m, arr / 0.5, 0.0)

    out = gat_conv_colpanel(g, s, a_src, a_dst, 0.2, attn_dropout=(drop, 1))
    ref = gat_conv_colpanel(g, s, a_src, a_dst, 0.2)
    assert np.all(np.isfinite(np.asarray(out)))
    assert not np.allclose(np.asarray(out), np.asarray(ref))


def test_check_guard_rejects_zero_weights():
    import pytest

    m = sp.random(30, 30, density=0.2, random_state=0, format="coo")
    m.data[:] = 1.0
    m.data[0] = 0.0
    g = Graph.from_scipy(
        m.astype(np.float32), build_dense=False, build_bcsr=False,
        build_ell=False, build_hybrid=False, build_colpanel=True,
        panel_width=16,
    )
    with pytest.raises(ValueError, match="nonzero"):
        check_gat_colpanel(g)
    check_gat_colpanel(_graph())  # clean graph passes


def test_check_guard_rejects_duplicate_edges():
    import pytest

    # duplicate pair (incl. one cancelling pair): tocsc coalesces them, so
    # the colpanel layout attends once (or never) where the COO path
    # attends per copy — the guard must catch both
    snd = np.array([0, 1, 1, 2, 2], dtype=np.int32)
    rcv = np.array([1, 2, 2, 0, 0], dtype=np.int32)
    w = np.array([1.0, 0.5, 0.5, 1.0, -1.0], dtype=np.float32)
    g = Graph.from_coo(
        snd, rcv, w, n_nodes=3, build_dense=False, build_bcsr=False,
        build_ell=False, build_hybrid=False, build_colpanel=True,
        panel_width=2,
    )
    with pytest.raises(ValueError, match="duplicate"):
        check_gat_colpanel(g)
    # host-array form (the no-tunnel-pull path) sees the same failure
    with pytest.raises(ValueError, match="duplicate"):
        check_gat_colpanel(g, senders=snd, receivers=rcv, weights=w)


def test_empty_layout_fallback_preserves_dtype():
    from pygcn_tpu.ops.colpanel import ColPanelELL

    pe = ColPanelELL(panels=(), starts=(), widths=(), n_rows=4, n_vrows=0)
    s = jnp.zeros((4, H, F), jnp.bfloat16)
    out = gat_conv_colpanel(pe, s, jnp.zeros((H, F), jnp.bfloat16),
                            jnp.zeros((H, F), jnp.bfloat16))
    assert out.dtype == jnp.bfloat16
