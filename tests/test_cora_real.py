"""Real reference data through the Planetoid path (VERDICT r1 missing #1).

The reference repo ships the real Cora citation graph
(``/root/reference/data/cora/cora.cites``, 5429 directed edges over 2708
papers) but ``cora.content`` is a missing large blob — so features/labels are
synthesized from the real structure (``load_planetoid_structure``) while the
parser, symmetrization ``A + Aᵀ∘(Aᵀ>A) − A∘(Aᵀ>A)``, normalization, splits,
and training run on the true graph (reference ``pygcn/utils.py:348-382``).
"""

import os

import numpy as np
import pytest

CITES = "/root/reference/data/cora/cora.cites"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CITES), reason="reference cora.cites not available"
)


def test_parse_real_cites_pinned_counts():
    from pygcn_tpu.utils import native

    parsed = native.parse_edge_list(CITES)
    if parsed is None:  # native lib not built: NumPy path
        raw = np.genfromtxt(CITES, dtype=np.int64)
        parsed = (raw[:, 0], raw[:, 1])
    cited, citing = parsed
    # canonical Cora: 5429 directed cite edges over 2708 papers
    assert cited.size == 5429
    assert np.unique(np.concatenate([cited, citing])).size == 2708


@pytest.mark.parametrize("adj_norm", ["row", "sym"])
def test_structure_loader_real_graph(adj_norm):
    from pygcn_tpu.graph.datasets import load_planetoid_structure

    data = load_planetoid_structure(CITES, adj_norm=adj_norm, seed=0)
    assert data.graph.n_nodes == 2708
    a = data.graph.to_scipy().tocsr()
    if adj_norm == "row":
        # D⁻¹(A+I): 10556 symmetrized edges + 2708 self-loops, row sums 1
        assert a.nnz == 10556 + 2708
        np.testing.assert_allclose(np.asarray(a.sum(1)).ravel(), 1.0, rtol=1e-5)
    else:
        # Kipf D^{-1/2}(A+I)D^{-1/2} is symmetric with the same sparsity
        assert a.nnz == 10556 + 2708
        assert (a != a.T).nnz == 0
    # splits follow the reference's 140/300/1000
    assert data.idx_train.size == 140
    assert data.idx_val.size == 300
    assert data.idx_test.size == 1000
    # labels fold real communities into n_classes, every class populated
    assert set(np.unique(data.labels)) == set(range(data.n_classes))


def test_train_cora_on_real_structure(tmp_path):
    """KipfGCN trains end-to-end on the real citation structure and beats
    chance by a wide margin (labels are structure-derived, so the GCN can
    learn them through the graph)."""
    from pygcn_tpu.apps import train_cora

    acc = train_cora.main(
        ["--data_dir", "/root/reference/data/cora", "--epochs", "60",
         "--fastmode"]
    )
    assert acc > 0.5  # 7 classes → chance is ~0.14
