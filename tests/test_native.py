"""Native graphkit library vs NumPy fallbacks."""

import numpy as np
import pytest
import scipy.sparse as sp

from pygcn_tpu.utils import native


requires_native = pytest.mark.skipif(
    not native.available(), reason="graphkit native library not built"
)


@requires_native
def test_sort_edges_by_row():
    rng = np.random.default_rng(0)
    s = rng.integers(0, 50, 500)
    r = rng.integers(0, 50, 500)
    perm = native.sort_edges_by_row(s, r)
    expected = np.lexsort((s, r))
    np.testing.assert_array_equal(r[perm], r[expected])
    np.testing.assert_array_equal(s[perm], s[expected])


@requires_native
def test_coo_to_csr():
    rng = np.random.default_rng(1)
    r = np.sort(rng.integers(0, 30, 200))
    indptr = native.coo_to_csr(r, 30)
    m = sp.coo_matrix((np.ones(200), (r, np.zeros(200, np.int64))), shape=(30, 1)).tocsr()
    np.testing.assert_array_equal(indptr, np.concatenate([[0], np.cumsum(np.bincount(r, minlength=30))]))


@requires_native
def test_build_ell_layout_matches_numpy():
    rng = np.random.default_rng(2)
    n, e = 200, 3000
    m = sp.coo_matrix(
        (rng.uniform(0.1, 1.0, e), (rng.integers(0, n, e), rng.integers(0, n, e))),
        shape=(n, n),
    )
    m.sum_duplicates()
    csr = m.tocsr()
    ks = (4, 16, 64)
    cols, vals, rows = native.build_ell_layout(
        csr.indptr, csr.indices, csr.data, ks
    )
    # reconstruct the dense matrix from the layout
    dense = np.zeros((n, n))
    for c, v, r in zip(cols, vals, rows):
        for b in range(c.shape[0]):
            for j in range(c.shape[1]):
                if v[b, j] != 0:
                    dense[r[b], c[b, j]] += v[b, j]
    np.testing.assert_allclose(dense, m.toarray(), rtol=1e-6)


@requires_native
def test_parse_edge_list(tmp_path):
    path = tmp_path / "edges.txt"
    path.write_text("1 2\n3\t4\n100 200\n")
    a, b = native.parse_edge_list(str(path))
    np.testing.assert_array_equal(a, [1, 3, 100])
    np.testing.assert_array_equal(b, [2, 4, 200])


def test_ell_via_native_matches_spmm():
    """build_ell (whichever path) stays correct end-to-end."""
    import jax
    import jax.numpy as jnp

    from pygcn_tpu.ops.ell import build_ell, ell_spmm_raw

    rng = np.random.default_rng(3)
    n, e = 150, 2000
    m = sp.coo_matrix(
        (rng.uniform(0.1, 1.0, e), (rng.integers(0, n, e), rng.integers(0, n, e))),
        shape=(n, n),
    )
    m.sum_duplicates()
    ell = build_ell(m, (4, 16, 64))
    x = jnp.asarray(rng.normal(size=(n, 12)).astype(np.float32))
    out = ell_spmm_raw(ell, x)
    np.testing.assert_allclose(
        np.asarray(out), m.toarray() @ np.asarray(x), rtol=2e-4, atol=2e-4
    )


def test_unique_inverse_matches_numpy():
    """Hash, bounded, and fallback paths all reproduce np.unique exactly."""
    rng = np.random.default_rng(4)
    scratch = np.zeros(500, np.int32)
    for n in [0, 1, 9, 1000, 20000]:
        v = rng.integers(0, 500, n).astype(np.int64)
        expect_u, expect_i = np.unique(v, return_inverse=True)
        for kwargs in [{}, {"n_max": 500}, {"n_max": 500, "scratch": scratch}]:
            u, i = native.unique_inverse(v, **kwargs)
            np.testing.assert_array_equal(u, expect_u)
            np.testing.assert_array_equal(i, expect_i)
        assert not scratch.any()  # returned zeroed for reuse
    if native.available():
        # the dense-rank kernel must reject out-of-range values (np.unique
        # would accept them; the kernel would index scratch out of bounds)
        for bad in ([-1, 3], [3, 500]):
            with pytest.raises(ValueError):
                native.unique_inverse(np.array(bad, np.int64), 500)


def test_label_propagation_finds_planted_communities():
    """Native LP (and the NumPy fallback) recovers SBM blocks."""
    import numpy as np
    import scipy.sparse as sp

    from pygcn_tpu.utils import native

    rng = np.random.default_rng(0)
    n, b = 120, 3
    block = np.repeat(np.arange(b), n // b)
    p = np.where(block[:, None] == block[None, :], 0.3, 0.01)
    a = sp.csr_matrix(np.triu(rng.uniform(size=(n, n)) < p, 1).astype(np.float32))
    a = a + a.T

    labels = native.label_propagation(a.indptr, a.indices, a.data)
    # all same-block pairs should share a label for a planted partition this
    # strong; communities must not merge across blocks
    for g in range(b):
        assert len(set(labels[block == g])) == 1, g
    assert len(set(labels)) == b

    if native.available():
        # NumPy fallback must agree with the native kernel exactly
        import pygcn_tpu.utils.native as nat

        lib, nat._lib = nat._lib, None
        tried = nat._tried
        nat._tried = True  # block reload -> force fallback
        try:
            labels_py = native.label_propagation(a.indptr, a.indices, a.data)
        finally:
            nat._lib, nat._tried = lib, tried
        np.testing.assert_array_equal(labels, labels_py)


def test_locality_order_lp_groups_communities():
    import numpy as np
    import scipy.sparse as sp

    from pygcn_tpu.graph.graph import Graph
    from pygcn_tpu.parallel.partition import locality_order

    rng = np.random.default_rng(1)
    n, b = 240, 4
    block = np.repeat(np.arange(b), n // b)
    # interleave blocks in node id so natural order is maximally non-local
    ids = np.argsort(np.tile(np.arange(n // b), b), kind="stable")
    block = block[ids]
    p = np.where(block[:, None] == block[None, :], 0.25, 0.005)
    a = sp.coo_matrix(np.triu(rng.uniform(size=(n, n)) < p, 1).astype(np.float32))
    a = (a + a.T).tocoo()
    g = Graph.from_scipy(a, is_symmetric=True, build_dense=False)
    perm = locality_order(g, method="lp")
    assert sorted(perm.tolist()) == list(range(n))
    # nodes of the same planted block end up contiguous: with 4 shards of 60,
    # the cross-shard edge fraction should drop far below the interleaved one
    inv = np.empty(n, np.int64); inv[perm] = np.arange(n)
    s, r = inv[a.row], inv[a.col]
    cross_new = (s // 60 != r // 60).mean()
    cross_old = (a.row // 60 != a.col // 60).mean()
    assert cross_new < 0.25 * cross_old


def test_sample_layer_native_matches_fallback():
    """Fused native sampling == NumPy fallback, bit for bit, both modes."""
    rng = np.random.default_rng(7)
    n = 300
    a = sp.random(n, n, density=0.04, random_state=7, format="csr")
    a.data = a.data.astype(np.float32)
    indptr = a.indptr.astype(np.int64)
    indices = a.indices.astype(np.int64)
    # include zero-degree rows among the targets
    out_nodes = rng.integers(0, n, 64).astype(np.int64)
    for mode in ("gcn", "mean"):
        for base in (0, 12345, (1 << 63) + 99):
            cols_n, w_n = native.sample_layer(
                indptr, indices, a.data, out_nodes, 5, base, mode=mode
            )
            lib, tried = native._lib, native._tried
            native._lib, native._tried = None, True  # force fallback
            try:
                cols_f, w_f = native.sample_layer(
                    indptr, indices, a.data, out_nodes, 5, base, mode=mode
                )
            finally:
                native._lib, native._tried = lib, tried
            np.testing.assert_array_equal(cols_n, cols_f)
            np.testing.assert_array_equal(w_n, w_f)

    # semantics: picks index the node's own CSR row; zero-degree rows emit
    # the node itself with weight 0
    cols, w = native.sample_layer(indptr, indices, a.data, out_nodes, 5, 1, mode="gcn")
    deg = indptr[out_nodes + 1] - indptr[out_nodes]
    for i, node in enumerate(out_nodes):
        if deg[i] == 0:
            assert (cols[i] == node).all() and (w[i] == 0).all()
        else:
            row = indices[indptr[node]:indptr[node + 1]]
            assert np.isin(cols[i], row).all()


def test_sample_layer_threads_bit_identical():
    """Row-parallel native sampling == serial for every thread count."""
    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    n = 500
    a = sp.random(n, n, density=0.03, random_state=11, format="csr")
    a.data = a.data.astype(np.float32)
    indptr = a.indptr.astype(np.int64)
    indices = a.indices.astype(np.int64)
    out_nodes = rng.integers(0, n, 1000).astype(np.int64)
    for mode in ("gcn", "mean"):
        c1, w1 = native.sample_layer(
            indptr, indices, a.data, out_nodes, 7, 42, mode=mode, threads=1
        )
        for th in (2, 3, 8, 64):
            ct, wt = native.sample_layer(
                indptr, indices, a.data, out_nodes, 7, 42, mode=mode,
                threads=th,
            )
            np.testing.assert_array_equal(c1, ct)
            np.testing.assert_array_equal(w1, wt)


def test_sample_layer_fallback_isolated_last_node():
    """Regression: the NumPy fallback used to index past `indices` for a
    zero-degree node whose (empty) CSR row sits at the end of the array."""
    a = sp.csr_matrix(
        np.array([[0, 1, 0], [1, 0, 0], [0, 0, 0]], np.float32)
    )
    out_nodes = np.array([2, 0], np.int64)  # node 2 is isolated, row at nnz
    lib, tried = native._lib, native._tried
    native._lib, native._tried = None, True  # force fallback
    try:
        cols, w = native.sample_layer(
            a.indptr.astype(np.int64), a.indices.astype(np.int64),
            a.data.astype(np.float32), out_nodes, 4, 123, mode="gcn",
        )
    finally:
        native._lib, native._tried = lib, tried
    assert (cols[0] == 2).all() and (w[0] == 0).all()
    assert (cols[1] == 1).all()  # node 0's only neighbor

    # fully edgeless graph
    e = sp.csr_matrix((3, 3), dtype=np.float32)
    native._lib, native._tried = None, True
    try:
        cols, w = native.sample_layer(
            e.indptr.astype(np.int64), e.indices.astype(np.int64),
            e.data.astype(np.float32), out_nodes, 2, 0, mode="mean",
        )
    finally:
        native._lib, native._tried = lib, tried
    assert (cols == out_nodes[:, None]).all() and (w == 0).all()
