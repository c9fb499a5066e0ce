import numpy as np
import scipy.sparse as sp

from pygcn_tpu.graph import (
    Graph,
    add_self_loops,
    row_normalize,
    sym_normalize,
    symmetrize_max,
)


def random_coo(n, e, seed=0, weighted=True):
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, n, e)
    cols = rng.integers(0, n, e)
    vals = rng.uniform(0.1, 1.0, e) if weighted else np.ones(e)
    m = sp.coo_matrix((vals, (rows, cols)), shape=(n, n))
    m.sum_duplicates()
    return m.tocoo()


def test_from_coo_roundtrip():
    m = random_coo(300, 2000)
    g = Graph.from_scipy(m)
    assert g.n_nodes == 300
    assert g.n_edges == m.nnz
    back = g.to_scipy()
    assert np.allclose(back.toarray(), m.toarray())


def test_padding_and_sorting():
    m = random_coo(50, 200)
    g = Graph.from_scipy(m)
    assert g.e_pad % 512 == 0
    recv = np.asarray(g.receivers[: g.n_edges])
    assert (np.diff(recv) >= 0).all()
    # padding edges carry zero weight
    assert np.all(np.asarray(g.weights[g.n_edges :]) == 0)


def test_dense_layout_matches():
    m = random_coo(100, 700)
    g = Graph.from_scipy(m, build_dense=True)
    assert np.allclose(np.asarray(g.dense), m.toarray())


def test_bcsr_reconstruction():
    m = random_coo(300, 3000)
    g = Graph.from_scipy(m, build_bcsr=True, build_dense=False)
    b = g.bcsr
    dense = np.zeros((b.n_block_rows * b.tm, b.n_block_cols * b.tk))
    data = np.asarray(b.data)
    for t in range(data.shape[0]):
        r = int(b.block_rows[t]) * b.tm
        c = int(b.block_cols[t]) * b.tk
        dense[r : r + b.tm, c : c + b.tk] += data[t]
    assert np.allclose(dense[:300, :300], m.toarray())
    # every block row owns at least one tile
    ptr = np.asarray(b.block_row_ptr)
    assert (np.diff(ptr) >= 1).all()


def test_transpose():
    m = random_coo(80, 500)
    g = Graph.from_scipy(m)
    gt = g.transpose()
    assert np.allclose(gt.to_scipy().toarray(), m.T.toarray())


def test_npz_dataset_roundtrip(tmp_path):
    """save_npz_dataset → load_npz_dataset(adj_norm='none') is lossless."""
    from pygcn_tpu.graph.datasets import (
        load_npz_dataset,
        save_npz_dataset,
        sbm_classification,
    )

    data = sbm_classification(n=200, n_classes=3, feat_dim=8, seed=5,
                              n_val=40, n_test=60,
                              build_dense=False, build_bcsr=False)
    path = str(tmp_path / "ds.npz")
    save_npz_dataset(path, data)
    # the dump carries the already-normalized adjacency and features
    back = load_npz_dataset(path, adj_norm="none", normalize_features=False,
                            build_dense=False, build_bcsr=False)
    np.testing.assert_allclose(
        back.graph.to_scipy().toarray(), data.graph.to_scipy().toarray(),
        rtol=1e-6,
    )
    np.testing.assert_allclose(back.features, data.features, rtol=1e-6)
    np.testing.assert_array_equal(back.labels, data.labels)
    np.testing.assert_array_equal(back.idx_test, data.idx_test)
    assert back.n_classes == data.n_classes

    # train_fullgraph and train_sampled consume the file end-to-end
    from pygcn_tpu.apps import train_fullgraph, train_sampled

    r = train_fullgraph.main(["--npz", path, "--epochs", "3",
                              "--hidden", "8", "--layers", "2"])
    assert r["dt"] > 0 and 0.0 <= r["val"] <= 1.0
    acc = train_sampled.main(["--npz", path, "--epochs", "2",
                              "--batch_size", "16", "--fanouts", "4", "4",
                              "--hidden", "8"])
    assert 0.0 <= acc <= 1.0


def test_symmetrize_max():
    m = random_coo(60, 300)
    s = symmetrize_max(m)
    expected = np.maximum(m.toarray(), m.toarray().T)
    assert np.allclose(s.toarray(), expected)


def test_row_normalize():
    m = random_coo(40, 200)
    r = row_normalize(m).toarray()
    sums = r.sum(1)
    nonzero = m.toarray().sum(1) != 0
    assert np.allclose(sums[nonzero], 1.0)
    assert np.allclose(sums[~nonzero], 0.0)


def test_sym_normalize():
    m = random_coo(40, 200)
    a = sym_normalize(m)
    d = add_self_loops(m).toarray()
    deg = d.sum(1)
    expected = d / np.sqrt(np.outer(deg, deg))
    assert np.allclose(a.toarray(), expected)


def test_community_graph_structure():
    """The bench workload generator: ~p_in of edges inside ~community_size
    blocks, power-law background, optional id shuffle (bench.py r2)."""
    from pygcn_tpu.graph.datasets import community_graph

    n, size = 2048, 128
    m = community_graph(n, 10.0, community_size=size, p_in=0.7, seed=0,
                        shuffle=False)
    comm = np.minimum(np.arange(n) // size, n // size - 1)
    within = (comm[m.row] == comm[m.col]).mean()
    assert 0.55 < within < 0.85  # ~p_in, minus duplicate-collapse noise
    assert m.shape == (n, n)
    assert (m.row != m.col).all()  # no self loops

    # shuffling relabels nodes but preserves the degree multiset
    ms = community_graph(n, 10.0, community_size=size, p_in=0.7, seed=0,
                         shuffle=True)
    assert ms.nnz == m.nnz
    deg = np.bincount(m.row, minlength=n)
    deg_s = np.bincount(ms.row, minlength=n)
    assert np.array_equal(np.sort(deg), np.sort(deg_s))
    # shuffled labels scatter communities (id-contiguous blocks lose edges)
    within_s = (comm[ms.row] == comm[ms.col]).mean()
    assert within_s < 0.2


def test_layout_by_scale_auto_policy():
    """Graph.from_coo defaults encode the measured layout-by-scale policy
    (PERF_NOTES.md): dense <= dense_max_nodes, hybrid BCSR+ELL in the mid
    band, ColPanelELL above the colpanel threshold (global ELL skipped
    there), panels never by default. Thresholds shrunk to test scale."""
    import scipy.sparse as sp

    from pygcn_tpu.ops.spmm import _resolve_impl

    rng = np.random.default_rng(0)
    m = sp.random(300, 300, density=0.05, random_state=3, format="coo")
    m = ((m + m.T) * 0.5).tocoo()

    # small: dense wins
    g = Graph.from_scipy(m, is_symmetric=True)
    assert g.dense is not None and _resolve_impl(g, "auto") == "dense"

    # mid band: hybrid (+ ELL fallback), no colpanel, no panel
    g = Graph.from_scipy(m, is_symmetric=True, dense_max_nodes=64,
                         colpanel_min_nodes=1000)
    assert g.dense is None and g.hybrid is not None and g.ell is not None
    assert g.colpanel is None and g.panel is None
    assert _resolve_impl(g, "auto") == "hybrid"

    # large: colpanel only (global ELL and hybrid skipped by default)
    g = Graph.from_scipy(m, is_symmetric=True, dense_max_nodes=64,
                         colpanel_min_nodes=200, panel_width=128)
    assert g.colpanel is not None and g.hybrid is None and g.ell is None
    assert _resolve_impl(g, "auto") == "colpanel"

    # explicit overrides still win
    g = Graph.from_scipy(m, is_symmetric=True, dense_max_nodes=64,
                         colpanel_min_nodes=200, build_colpanel=False,
                         build_ell=True)
    assert g.colpanel is None and g.ell is not None
