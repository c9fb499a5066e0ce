"""GAT ops and layers vs dense masked-softmax references."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from pygcn_tpu.graph.datasets import sbm_classification
from pygcn_tpu.graph.graph import Graph
from pygcn_tpu.nn.gat import GAT, GATConv
from pygcn_tpu.ops.gat import attention_aggregate, edge_softmax, gat_attention
from pygcn_tpu.train import adam_l2


def _random_graph(n=40, density=0.12, seed=0, pad=True):
    m = sp.random(n, n, density=density, random_state=seed, format="coo")
    m.data[:] = 1.0
    g = Graph.from_scipy(
        m.astype(np.float32), build_dense=False, build_bcsr=False, build_ell=False
    )
    if pad:
        assert g.e_pad > g.n_edges, "want padding edges to exercise masking"
    return g, m


def _dense_alpha(m, logits_e):
    """Reference: per-receiver masked softmax of edge logits."""
    n = m.shape[0]
    full = np.full((n, n), -np.inf)
    for (r, s, e) in zip(*logits_e):
        full[r, s] = e
    out = np.zeros((n, n))
    for r in range(n):
        row = full[r]
        if np.isfinite(row).any():
            z = np.exp(row - row[np.isfinite(row)].max())
            z[~np.isfinite(row)] = 0.0
            out[r] = z / z.sum()
    return out


def test_edge_softmax_matches_dense_and_masks_padding():
    g, m = _random_graph()
    rng = np.random.default_rng(0)
    logits = rng.normal(size=g.e_pad).astype(np.float32)
    alpha = np.asarray(edge_softmax(g, jnp.asarray(logits)))

    # padded edges contribute nothing
    assert (alpha[g.n_edges:] == 0).all()

    recv = np.asarray(g.receivers[: g.n_edges])
    send = np.asarray(g.senders[: g.n_edges])
    want = _dense_alpha(m, (recv, send, logits[: g.n_edges]))
    got = np.zeros_like(want)
    got[recv, send] = alpha[: g.n_edges]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # each receiver with edges sums to 1
    sums = got.sum(1)
    has = np.zeros(m.shape[0], bool)
    has[recv] = True
    np.testing.assert_allclose(sums[has], 1.0, rtol=1e-5)


def test_gatconv_matches_dense_reference():
    g, m = _random_graph(n=30, seed=1)
    layer = GATConv(6, 4, heads=3)
    params = layer.init(jax.random.key(0))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(30, 6)).astype(np.float32))

    got = np.asarray(layer.apply(params, x, g))

    # dense reference, head by head
    n, h, f = 30, 3, 4
    s = np.asarray(jnp.dot(x, params["w"])).reshape(n, h, f)
    adj = (m.toarray() > 0)
    want = np.zeros((n, h, f))
    for k in range(h):
        lsrc = s[:, k] @ np.asarray(params["a_src"][k])
        ldst = s[:, k] @ np.asarray(params["a_dst"][k])
        e = lsrc[None, :] + ldst[:, None]  # [recv, send]
        e = np.where(e > 0, e, 0.2 * e)  # leaky relu
        e = np.where(adj, e, -np.inf)
        for r in range(n):
            if adj[r].any():
                z = np.exp(e[r] - e[r][adj[r]].max())
                z[~adj[r]] = 0.0
                want[r, k] = (z / z.sum()) @ s[:, k]
    want = want.reshape(n, h * f) + np.asarray(params["b"])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_gat_learns_sbm():
    data = sbm_classification(
        n=200, n_classes=3, feat_dim=16, seed=0,
        train_per_class=12, n_val=30, n_test=60,
        build_dense=False, build_bcsr=False, build_ell=False,
    )
    model = GAT(nfeat=16, nhid=8, nclass=3, heads=4)
    params = model.init(jax.random.key(0))
    tx = adam_l2(0.01, 5e-4)
    opt_state = tx.init(params)
    x = jnp.asarray(data.features)
    labels = jnp.asarray(data.labels)
    mask = jnp.zeros(200).at[jnp.asarray(data.idx_train)].set(1.0)

    import optax

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logp = model.apply(p, x, data.graph)
            per = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
            return (per * mask).sum() / mask.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(60):
        params, opt_state, loss = step(params, opt_state)
    assert np.isfinite(float(loss))
    preds = np.asarray(model.apply(params, x, data.graph)).argmax(1)
    acc = (preds[data.idx_test] == np.asarray(data.labels)[data.idx_test]).mean()
    assert acc > 0.75, acc


def test_gat_dropout_paths():
    """dropout_rng enables input+attention dropout; eval path unchanged."""
    g, _ = _random_graph(n=30, seed=2)
    model = GAT(nfeat=6, nhid=4, nclass=3, heads=2, dropout=0.5)
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(30, 6)).astype(np.float32))

    eval_out = model.apply(params, x, g)
    eval_out2 = model.apply(params, x, g)  # deterministic without rng
    np.testing.assert_array_equal(np.asarray(eval_out), np.asarray(eval_out2))

    t1 = model.apply(params, x, g, dropout_rng=jax.random.key(1))
    t2 = model.apply(params, x, g, dropout_rng=jax.random.key(2))
    assert not np.allclose(np.asarray(t1), np.asarray(t2))
    assert np.isfinite(np.asarray(t1)).all()
    # log_softmax rows still normalize
    np.testing.assert_allclose(np.exp(np.asarray(t1)).sum(1), 1.0, rtol=1e-5)


def _ell_graph(n=60, density=0.08, seed=4):
    m = sp.random(n, n, density=density, random_state=seed, format="coo")
    m.data[:] = rngd = np.random.default_rng(seed).uniform(0.5, 2.0, m.nnz).astype(np.float32)
    return Graph.from_scipy(
        m.astype(np.float32), build_dense=False, build_bcsr=False, build_ell=True
    ), m


def test_edge_map_reconstructs_vals():
    """eidx must align with the built ELL layout (native or NumPy builder):
    gathering CSR edge weights through eidx reproduces ell.vals exactly."""
    from pygcn_tpu.ops.gat import build_edge_map

    g, m = _ell_graph()
    em = build_edge_map(g)
    csr_data = np.asarray(g.weights[: g.n_edges])  # canonical edge order
    table = np.concatenate([
        np.asarray(g.weights), np.zeros(1, np.float32)  # e_pad + sentinel
    ])
    for eidx, vals in zip(em.eidx, g.ell.vals):
        got = table[np.asarray(eidx)]
        np.testing.assert_array_equal(got, np.asarray(vals))


def test_fused_ell_gat_matches_reference_path():
    """Slot-native gat_conv_ell == the COO-segment path (softmax + aggregate),
    and GATConv(edge_map=...) == GATConv() forward AND gradients."""
    from pygcn_tpu.ops.gat import build_edge_map, gat_conv_ell

    g, _ = _ell_graph()
    em = build_edge_map(g)
    rng = np.random.default_rng(5)
    s = jnp.asarray(rng.normal(size=(60, 3, 4)).astype(np.float32))
    a_src = jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32))
    a_dst = jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32))

    alpha_ref = gat_attention(g, s, a_src, a_dst)
    out_ref = attention_aggregate(g, s, alpha_ref)
    out_ell = gat_conv_ell(g, em, s, a_src, a_dst)
    np.testing.assert_allclose(np.asarray(out_ell), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-5)

    layer = GATConv(5, 4, heads=2)
    params = layer.init(jax.random.key(1))
    x = jnp.asarray(rng.normal(size=(60, 5)).astype(np.float32))

    def loss(p, use_em):
        out = layer.apply(p, x, g, edge_map=em if use_em else None)
        return (out ** 2).sum()

    l_ref, g_ref = jax.value_and_grad(loss)(params, False)
    l_ell, g_ell = jax.value_and_grad(loss)(params, True)
    np.testing.assert_allclose(float(l_ell), float(l_ref), rtol=1e-4)
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_ell[k]), np.asarray(g_ref[k]),
                                   rtol=2e-3, atol=1e-5)



def test_gatv2_attention_matches_dense_reference():
    """gatv2_attention == dense masked softmax of a·leaky_relu(s_l[u]+s_r[v])."""
    from pygcn_tpu.ops.gat import gatv2_attention

    g, m = _random_graph(n=30, seed=6)
    rng = np.random.default_rng(6)
    h, f = 3, 4
    s_l = rng.normal(size=(30, h, f)).astype(np.float32)
    s_r = rng.normal(size=(30, h, f)).astype(np.float32)
    a = rng.normal(size=(h, f)).astype(np.float32)

    alpha = np.asarray(gatv2_attention(
        g, jnp.asarray(s_l), jnp.asarray(s_r), jnp.asarray(a)))
    assert (alpha[g.n_edges:] == 0).all()

    recv = np.asarray(g.receivers[: g.n_edges])
    send = np.asarray(g.senders[: g.n_edges])

    def lrelu(v):
        return np.where(v >= 0, v, 0.2 * v)

    for k in range(h):
        logits = (lrelu(s_l[send, k] + s_r[recv, k]) * a[k]).sum(1)
        want = _dense_alpha(m, (recv, send, logits))
        got = np.zeros_like(want)
        got[recv, send] = alpha[: g.n_edges, k]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_gatv2_is_dynamic_where_v1_is_static():
    """v1's neighbor ranking is receiver-independent (a_src·s_u ordering);
    v2 can rank the same two senders differently for different receivers."""
    from pygcn_tpu.ops.gat import gat_attention, gatv2_attention

    # complete bipartite-ish toy: receivers 2,3 each attend senders 0,1
    rows = np.array([2, 2, 3, 3])
    cols = np.array([0, 1, 0, 1])
    m = sp.coo_matrix((np.ones(4, np.float32), (rows, cols)), shape=(4, 4))
    g = Graph.from_scipy(m, build_dense=False, build_bcsr=False, build_ell=False)
    # dynamic ranking needs the leaky_relu kink: receiver 3's big negative
    # first coordinate pushes sender 0's dominant feature past it, flipping
    # the order that receiver 2 sees
    h, f = 1, 2
    s_l = jnp.asarray([[10.0, 0.0], [0.0, 4.0], [0.0, 0.0], [-20.0, 0.0]],
                      jnp.float32).reshape(4, h, f)
    a = jnp.asarray([[1.0, 1.0]], jnp.float32)

    def rank(alpha):
        # per receiver: does sender 0 beat sender 1?
        al = np.asarray(alpha)[: g.n_edges, 0]
        e = {(int(r), int(c)): al[i] for i, (r, c) in enumerate(
            zip(np.asarray(g.receivers[: g.n_edges]),
                np.asarray(g.senders[: g.n_edges])))}
        return e[(2, 0)] > e[(2, 1)], e[(3, 0)] > e[(3, 1)]

    r1 = rank(gat_attention(g, s_l, a, a))
    assert r1[0] == r1[1]  # v1: same ranking for every receiver, always
    r2 = rank(gatv2_attention(g, s_l, s_l, a))
    assert r2[0] != r2[1]  # v2: receiver-dependent ranking on this input


def test_gatv2_conv_ell_matches_coo_path():
    """Slot-native gatv2_conv_ell == COO path; GATv2Conv fwd+grads agree."""
    from pygcn_tpu.nn.gat import GATv2Conv
    from pygcn_tpu.ops.gat import (
        build_edge_map, gatv2_attention, gatv2_conv_ell,
    )

    g, _ = _ell_graph()
    em = build_edge_map(g)
    rng = np.random.default_rng(7)
    s_l = jnp.asarray(rng.normal(size=(60, 3, 4)).astype(np.float32))
    s_r = jnp.asarray(rng.normal(size=(60, 3, 4)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32))

    alpha_ref = gatv2_attention(g, s_l, s_r, a)
    out_ref = attention_aggregate(g, s_l, alpha_ref)
    out_ell = gatv2_conv_ell(g, em, s_l, s_r, a)
    np.testing.assert_allclose(np.asarray(out_ell), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-5)

    layer = GATv2Conv(5, 4, heads=2)
    params = layer.init(jax.random.key(1))
    x = jnp.asarray(rng.normal(size=(60, 5)).astype(np.float32))

    def loss(p, use_em):
        out = layer.apply(p, x, g, edge_map=em if use_em else None)
        return (out ** 2).sum()

    l_ref, g_ref = jax.value_and_grad(loss)(params, False)
    l_ell, g_ell = jax.value_and_grad(loss)(params, True)
    np.testing.assert_allclose(float(l_ell), float(l_ref), rtol=1e-4)
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_ell[k]), np.asarray(g_ref[k]),
                                   rtol=2e-3, atol=1e-5)

    # share_weights ties W_r = W_l
    tied = GATv2Conv(5, 4, heads=2, share_weights=True)
    tp = tied.init(jax.random.key(2))
    assert "w_r" not in tp
    out = tied.apply(tp, x, g)
    assert np.isfinite(np.asarray(out)).all()


def test_gatv2_learns_sbm():
    data = sbm_classification(
        n=200, n_classes=3, feat_dim=16, seed=0,
        train_per_class=12, n_val=30, n_test=60,
        build_dense=False, build_bcsr=False, build_ell=False,
    )
    model = GAT(nfeat=16, nhid=8, nclass=3, heads=4, v2=True)
    params = model.init(jax.random.key(0))
    tx = adam_l2(0.01, 5e-4)
    opt_state = tx.init(params)
    x = jnp.asarray(data.features)
    labels = jnp.asarray(data.labels)
    mask = jnp.zeros(200).at[jnp.asarray(data.idx_train)].set(1.0)

    import optax

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logp = model.apply(p, x, data.graph)
            per = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
            return (per * mask).sum() / mask.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(60):
        params, opt_state, loss = step(params, opt_state)
    preds = np.asarray(model.apply(params, x, data.graph)).argmax(1)
    acc = (preds[data.idx_test] == np.asarray(data.labels)[data.idx_test]).mean()
    assert acc > 0.75, acc


def test_onepass_flash_gat_matches_segmax_path():
    """gat_conv_ell(stabilizer='flash') — the fused one-pass variant with the
    exact per-vrow local-max / rescaled-combine softmax — matches the
    three-pass segment_max path in values and gradients, including the
    attention-dropout formulation (numerator-only drop == dropping
    normalized alpha)."""
    from pygcn_tpu.ops.gat import build_edge_map, gat_conv_ell

    g, _ = _ell_graph()
    em = build_edge_map(g)
    rng = np.random.default_rng(11)
    s = jnp.asarray(rng.normal(size=(60, 3, 4)).astype(np.float32))
    a_src = jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32))
    a_dst = jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32))

    out_ref = gat_conv_ell(g, em, s, a_src, a_dst, stabilizer="segmax")
    out_one = gat_conv_ell(g, em, s, a_src, a_dst, stabilizer="flash")
    np.testing.assert_allclose(np.asarray(out_one), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-5)

    def loss(v, stab):
        return (gat_conv_ell(g, em, v, a_src, a_dst, stabilizer=stab) ** 2).sum()

    g_ref = jax.grad(loss)(s, "segmax")
    g_one = jax.grad(loss)(s, "flash")
    np.testing.assert_allclose(np.asarray(g_one), np.asarray(g_ref),
                               rtol=2e-3, atol=1e-5)

    # deterministic dropout: same mask per (slot, bucket) in both paths
    def drop(key_slot, arr):
        k = jax.random.fold_in(jax.random.key(7), hash(key_slot) % (2**31))
        keep = jax.random.bernoulli(k, 0.6, arr.shape).astype(arr.dtype)
        return arr * keep / 0.6

    out_ref_d = gat_conv_ell(g, em, s, a_src, a_dst, attn_dropout=(drop, 0),
                             stabilizer="segmax")
    out_one_d = gat_conv_ell(g, em, s, a_src, a_dst, attn_dropout=(drop, 0),
                             stabilizer="flash")
    np.testing.assert_allclose(np.asarray(out_one_d), np.asarray(out_ref_d),
                               rtol=1e-4, atol=1e-5)


def test_onepass_flash_exact_on_ill_conditioned_logits():
    """The round-2 'bound' stabilizer collapsed attention toward uniform when
    every incoming logit sat far below the node-level bound (one huge-lsrc
    hub not adjacent to a receiver made the bound loose by >60). The exact
    flash combine must match segmax on exactly that construction."""
    from pygcn_tpu.ops.gat import build_edge_map, gat_conv_ell

    g, m = _ell_graph(n=60, density=0.08, seed=13)
    em = build_edge_map(g)
    rng = np.random.default_rng(13)
    s = rng.normal(size=(60, 2, 4)).astype(np.float32)
    a_src = np.zeros((2, 4), np.float32)
    a_src[:, 0] = 1.0  # lsrc = s[..., 0]
    a_dst = rng.normal(size=(2, 4)).astype(np.float32) * 0.1
    # a node with an enormous source logit: receivers NOT adjacent to it
    # have true max logits ~O(1) while the old global bound sat ~200 above
    csr = m.tocsr()
    hub = int(np.argmin(np.asarray(csr.sum(axis=0)).ravel()))  # least-referenced
    s[hub, :, 0] = 250.0
    s = jnp.asarray(s)

    out_ref = gat_conv_ell(g, em, s, jnp.asarray(a_src), jnp.asarray(a_dst),
                           stabilizer="segmax")
    out_one = gat_conv_ell(g, em, s, jnp.asarray(a_src), jnp.asarray(a_dst),
                           stabilizer="flash")
    np.testing.assert_allclose(np.asarray(out_one), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-5)


def test_gatv2_onepass_matches_segmax_path():
    """gatv2_conv_ell(stabilizer='flash') == the 3-pass v2 path, values and
    gradients (the v1 node-level bound does not exist for v2; the exact
    local-max combine needs none)."""
    from pygcn_tpu.ops.gat import build_edge_map, gatv2_conv_ell

    g, _ = _ell_graph(seed=17)
    em = build_edge_map(g)
    rng = np.random.default_rng(17)
    s_l = jnp.asarray(rng.normal(size=(60, 3, 4)).astype(np.float32))
    s_r = jnp.asarray(rng.normal(size=(60, 3, 4)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32))

    out_ref = gatv2_conv_ell(g, em, s_l, s_r, a, stabilizer="segmax")
    out_one = gatv2_conv_ell(g, em, s_l, s_r, a, stabilizer="flash")
    np.testing.assert_allclose(np.asarray(out_one), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-5)

    def loss(v, stab):
        return (gatv2_conv_ell(g, em, v, s_r, a, stabilizer=stab) ** 2).sum()

    g_ref = jax.grad(loss)(s_l, "segmax")
    g_one = jax.grad(loss)(s_l, "flash")
    np.testing.assert_allclose(np.asarray(g_one), np.asarray(g_ref),
                               rtol=2e-3, atol=1e-5)

    def drop(key_slot, arr):
        k = jax.random.fold_in(jax.random.key(9), hash(key_slot) % (2**31))
        keep = jax.random.bernoulli(k, 0.6, arr.shape).astype(arr.dtype)
        return arr * keep / 0.6

    out_ref_d = gatv2_conv_ell(g, em, s_l, s_r, a, attn_dropout=(drop, 0),
                               stabilizer="segmax")
    out_one_d = gatv2_conv_ell(g, em, s_l, s_r, a, attn_dropout=(drop, 0),
                               stabilizer="flash")
    np.testing.assert_allclose(np.asarray(out_one_d), np.asarray(out_ref_d),
                               rtol=1e-4, atol=1e-5)


def _clustered_graph(n=320, seed=21, symmetric=False):
    """Graph with dense 128-tiles (communities) + sparse residual."""
    rng = np.random.default_rng(seed)
    # dense-ish block 0:128 x 0:128 and 128:256 x 128:256
    rows, cols = [], []
    for s0 in (0, 128):
        r = rng.integers(s0, s0 + 128, 3000)
        c = rng.integers(s0, s0 + 128, 3000)
        rows.append(r); cols.append(c)
    r = rng.integers(0, n, 800); c = rng.integers(0, n, 800)
    rows.append(r); cols.append(c)
    rows = np.concatenate(rows); cols = np.concatenate(cols)
    mask = rows != cols
    m = sp.coo_matrix((np.ones(mask.sum(), np.float32), (rows[mask], cols[mask])),
                      shape=(n, n))
    m.sum_duplicates()
    m.data[:] = np.random.default_rng(seed + 1).uniform(0.5, 2.0, m.nnz)
    if symmetric:
        m = m.maximum(m.T).tocoo()
    g = Graph.from_scipy(
        m.astype(np.float32), is_symmetric=symmetric, build_dense=False,
        build_bcsr=False, build_ell=False, build_hybrid=True,
        hybrid_min_edges_per_tile=64,
    )
    assert g.hybrid.bcsr is not None and g.hybrid.tile_edges > 0
    assert g.hybrid.tile_edges < g.n_edges  # residual non-empty too
    return g, m


def test_gat_hybrid_matches_coo_path():
    """gat_conv_hybrid (Pallas tile attention + ELL residual, flash-merged)
    == the COO softmax/aggregate reference, values AND gradients, on a graph
    where both tiles and residual edges are populated."""
    from pygcn_tpu.ops.gat import build_gat_tiles_t, gat_conv_hybrid

    for symmetric in (False, True):
        g, _ = _clustered_graph(symmetric=symmetric)
        tiles_t = build_gat_tiles_t(g)
        rng = np.random.default_rng(23)
        n = g.n_nodes
        h, f = 2, 4
        s = jnp.asarray(rng.normal(size=(n, h, f)).astype(np.float32))
        a_src = jnp.asarray(rng.normal(size=(h, f)).astype(np.float32))
        a_dst = jnp.asarray(rng.normal(size=(h, f)).astype(np.float32))

        alpha_ref = gat_attention(g, s, a_src, a_dst)
        out_ref = attention_aggregate(g, s, alpha_ref)
        out_h = gat_conv_hybrid(g, tiles_t, s, a_src, a_dst)
        np.testing.assert_allclose(np.asarray(out_h), np.asarray(out_ref),
                                   rtol=2e-4, atol=2e-5)

        def loss_ref(v, asrc, adst):
            al = gat_attention(g, v, asrc, adst)
            return (attention_aggregate(g, v, al) ** 2).sum()

        def loss_h(v, asrc, adst):
            return (gat_conv_hybrid(g, tiles_t, v, asrc, adst) ** 2).sum()

        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(s, a_src, a_dst)
        gh = jax.grad(loss_h, argnums=(0, 1, 2))(s, a_src, a_dst)
        for a, b in zip(gh, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=4e-3, atol=2e-4)


def test_gat_hybrid_streamed_variant_matches():
    """The streamed (per-tile outputs + XLA merge) kernel variant stays
    correct — kept behind TILE_REVISIT for future-pod A/Bs."""
    import pygcn_tpu.ops.pallas.gat_tile_attn as gmod
    from pygcn_tpu.ops.gat import build_gat_tiles_t, gat_conv_hybrid

    g, _ = _clustered_graph(symmetric=True)
    tiles_t = build_gat_tiles_t(g)
    rng = np.random.default_rng(29)
    s = jnp.asarray(rng.normal(size=(g.n_nodes, 2, 4)).astype(np.float32))
    a_src = jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32))
    a_dst = jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32))

    old = gmod.TILE_REVISIT
    try:
        gmod.TILE_REVISIT = True
        out_rv = gat_conv_hybrid(g, tiles_t, s, a_src, a_dst)
        g_rv = jax.grad(lambda v: (gat_conv_hybrid(g, tiles_t, v, a_src,
                                                   a_dst) ** 2).sum())(s)
        jax.clear_caches()
        gmod.TILE_REVISIT = False
        out_st = gat_conv_hybrid(g, tiles_t, s, a_src, a_dst)
        g_st = jax.grad(lambda v: (gat_conv_hybrid(g, tiles_t, v, a_src,
                                                   a_dst) ** 2).sum())(s)
    finally:
        gmod.TILE_REVISIT = old
        jax.clear_caches()
    np.testing.assert_allclose(np.asarray(out_st), np.asarray(out_rv),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_st), np.asarray(g_rv),
                               rtol=2e-3, atol=1e-4)


def test_gatv2_hybrid_matches_coo_path():
    """gatv2_conv_hybrid (Pallas v2 tile attention + slot-native residual,
    flash-merged) == the COO v2 softmax/aggregate reference, values AND
    gradients (incl. the attention vector ``a``), symmetric and asymmetric
    tile sets (VERDICT r3 #5)."""
    from pygcn_tpu.ops.gat import (build_gat_tiles_t, gatv2_attention,
                                   gatv2_conv_hybrid)

    for symmetric in (False, True):
        g, _ = _clustered_graph(symmetric=symmetric)
        tiles_t = build_gat_tiles_t(g)
        rng = np.random.default_rng(31)
        n = g.n_nodes
        h, f = 2, 4
        s_l = jnp.asarray(rng.normal(size=(n, h, f)).astype(np.float32))
        s_r = jnp.asarray(rng.normal(size=(n, h, f)).astype(np.float32))
        a = jnp.asarray(rng.normal(size=(h, f)).astype(np.float32))

        alpha_ref = gatv2_attention(g, s_l, s_r, a)
        out_ref = attention_aggregate(g, s_l, alpha_ref)
        out_h = gatv2_conv_hybrid(g, tiles_t, s_l, s_r, a)
        np.testing.assert_allclose(np.asarray(out_h), np.asarray(out_ref),
                                   rtol=2e-4, atol=2e-5)

        def loss_ref(sl, sr, av):
            al = gatv2_attention(g, sl, sr, av)
            return (attention_aggregate(g, sl, al) ** 2).sum()

        def loss_h(sl, sr, av):
            return (gatv2_conv_hybrid(g, tiles_t, sl, sr, av) ** 2).sum()

        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(s_l, s_r, a)
        gh = jax.grad(loss_h, argnums=(0, 1, 2))(s_l, s_r, a)
        for got, want in zip(gh, gr):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=4e-3, atol=3e-4)


def test_gatv2_hybrid_model_path():
    """GAT(v2=True).apply(hybrid_tiles=True) runs the fused v2 tile kernel
    end-to-end through the 2-layer model and matches the edge_map path."""
    from pygcn_tpu.nn.gat import GAT
    from pygcn_tpu.ops.gat import build_edge_map, build_gat_tiles_t

    g, m = _clustered_graph(symmetric=True)
    gell = Graph.from_scipy(
        m.astype(np.float32), is_symmetric=True, build_dense=False,
        build_bcsr=False, build_ell=True, build_hybrid=True,
        hybrid_min_edges_per_tile=64,
    )
    tiles_t = build_gat_tiles_t(gell)
    em = build_edge_map(gell)
    x = jnp.asarray(
        np.random.default_rng(7).normal(size=(g.n_nodes, 12)).astype(np.float32))
    model = GAT(nfeat=12, nhid=4, nclass=5, heads=2, v2=True)
    params = model.init(jax.random.key(0))
    out_t = model.apply(params, x, gell, hybrid_tiles=True, tiles_t=tiles_t)
    out_e = model.apply(params, x, gell, edge_map=em)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_e),
                               rtol=3e-4, atol=3e-5)
