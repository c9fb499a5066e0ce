import os

import numpy as np
import pandas as pd
import pytest

from pygcn_tpu.data import (
    ArrayLoader,
    assemble_evaluator_features,
    centrality_features,
    combine_vac_results,
    load_vac_results,
    make_split_loaders,
)
from pygcn_tpu.data.demographics import (
    load_cbg_age,
    load_cbg_demographics,
    load_cbg_income,
    load_cbg_occupation,
)
from pygcn_tpu.data.features import generator_features, standardize
from pygcn_tpu.graph.covisit import average_visits, covisitation_adj, load_or_build_adj
from pygcn_tpu.sim import calibration


def make_vac_csv(path, n=50, with_deaths=True, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    # row 0: no-vaccination baseline
    base = {"Vaccinated_Idxs": "[]", "Total_Cases": 7425.0, "Case_Rates_STD": 0.01}
    if with_deaths:
        base.update({"Total_Deaths": 120.0, "Death_Rates_STD": 0.001})
    rows.append(base)
    for i in range(n):
        idxs = sorted(rng.choice(100, 5, replace=False).tolist())
        r = {
            "Vaccinated_Idxs": "[" + ", ".join(map(str, idxs)) + "]",
            "Total_Cases": float(7000 + rng.normal(0, 100)),
            "Case_Rates_STD": float(rng.uniform(0, 0.02)),
        }
        if with_deaths:
            r.update(
                {
                    "Total_Deaths": float(100 + rng.normal(0, 10)),
                    "Death_Rates_STD": float(rng.uniform(0, 0.002)),
                }
            )
        rows.append(r)
    pd.DataFrame(rows).to_csv(path, index=False)


def test_load_vac_results(tmp_path):
    path = tmp_path / "vac.csv"
    make_vac_csv(path, n=50)
    res = load_vac_results(path, rel_result=True)
    assert res.num_samples == 50
    assert res.graph_labels.shape == (50, 4)
    # rel offsets: mean cases below baseline → negative-ish labels
    assert res.graph_labels[:, 0].mean() < 0
    # split sizes: 80/10/10 with test the middle slice, val the last
    assert len(res.idx_train) == 40
    assert len(res.idx_test) == 5
    assert len(res.idx_val) == 5
    all_idx = np.sort(np.concatenate([res.idx_train, res.idx_val, res.idx_test]))
    np.testing.assert_array_equal(all_idx, np.arange(50))
    # matches the reference's exact seed-42 shuffle
    shuffled = np.arange(50)
    np.random.seed(42)
    np.random.shuffle(shuffled)
    np.testing.assert_array_equal(res.idx_train, shuffled[:40])
    np.testing.assert_array_equal(res.idx_test, shuffled[40:45])
    np.testing.assert_array_equal(res.idx_val, shuffled[45:])
    # vac tags parse into int arrays
    assert all(len(t) == 5 for t in res.vac_tags)


def test_load_vac_results_abs_and_2col(tmp_path):
    path = tmp_path / "vac2.csv"
    make_vac_csv(path, n=20, with_deaths=False)
    res = load_vac_results(path, rel_result=False)
    assert res.graph_labels.shape == (20, 2)
    assert res.graph_labels[:, 0].mean() > 0


def test_combine_vac_results(tmp_path):
    p1, p2 = tmp_path / "a.csv", tmp_path / "b.csv"
    make_vac_csv(p1, n=10, seed=1)
    make_vac_csv(p2, n=10, seed=1)  # duplicates of p1
    combined = combine_vac_results([p1, p2])
    assert len(combined) == 11  # dedup: 1 baseline + 10 samples


def test_array_loader_batching():
    x = np.arange(23)[:, None]
    y = np.arange(23)
    loader = ArrayLoader([x, y], batch_size=5, shuffle=True, seed=0)
    seen = []
    for bx, by in loader:
        np.testing.assert_array_equal(bx[:, 0], by)
        seen.extend(by.tolist())
    assert sorted(seen) == list(range(23))
    assert len(loader) == 5


def test_make_split_loaders_quicktest_and_kfold():
    x = np.random.default_rng(0).normal(size=(40, 6, 3)).astype(np.float32)
    y = np.random.default_rng(1).normal(size=(40, 2)).astype(np.float32)
    tr = np.arange(30)
    va = np.arange(30, 35)
    te = np.arange(35, 40)
    train_l, val_l, test_l = make_split_loaders(x, y, tr, va, te, batch_size=8, quicktest=True)
    assert train_l.batch_size == 2 and train_l.n == 8
    assert val_l.n == 2 and test_l.n == 2

    (tv_x, tv_y), test_l = make_split_loaders(x, y, tr, va, te, batch_size=8, kfold=True)
    assert tv_x.shape[0] == 35
    assert test_l.n == 5


def test_centrality_features_small_graph():
    adj = np.array(
        [[0, 1, 1, 0], [1, 0, 1, 0], [1, 1, 0, 1], [0, 0, 1, 0]], np.float32
    )
    feats = centrality_features(adj, normalize=False)
    assert feats.shape == (4, 4)
    np.testing.assert_allclose(feats[:, 0], [2, 2, 3, 1])  # degrees
    assert feats[2, 2] == feats[:, 2].max()  # node 2 has max betweenness
    np.testing.assert_allclose(feats[:, 3], adj.sum(1))  # mobility level
    normed = centrality_features(adj, normalize=True)
    np.testing.assert_allclose(normed.mean(axis=0), 0, atol=1e-6)


def test_assemble_evaluator_features_modes():
    b, n, e = 3, 10, 5
    node_feats = np.random.default_rng(0).normal(size=(b, n, 4 + e + 1)).astype(np.float32)
    cent = np.random.default_rng(1).normal(size=(n, 4)).astype(np.float32)

    out, dt = assemble_evaluator_features(node_feats, cent, True, False)
    assert out.shape == (b, n, 4 + e + 4 + 1) and dt == out.shape[2] - 1
    out, dt = assemble_evaluator_features(node_feats, cent, True, True)
    assert out.shape == (b, n, 2 * (4 + e + 4) + 1) and dt == (out.shape[2] - 1) // 2
    out, dt = assemble_evaluator_features(node_feats, cent, False, False)
    assert out.shape == (b, n, 4 + 4 + 1) and dt == 8
    out, dt = assemble_evaluator_features(node_feats, cent, False, True)
    assert out.shape == (b, n, 2 * 8 + 1) and dt == 8
    # flag column preserved
    np.testing.assert_allclose(out[:, :, -1], node_feats[:, :, -1])


def test_generator_features():
    n = 10
    gen = np.random.default_rng(0).normal(size=(n, 6)).astype(np.float32)
    cent = np.random.default_rng(1).normal(size=(n, 4)).astype(np.float32)
    out, dt = generator_features(gen, cent)
    assert out.shape == (n, 20) and dt == 10
    np.testing.assert_allclose(out[:, :10], out[:, 10:])


def test_covisitation_matches_reference_loop():
    rng = np.random.default_rng(0)
    mats = [rng.uniform(0, 2, (6, 8)) for _ in range(5)]
    avg = average_visits(mats)
    np.testing.assert_allclose(avg, np.mean(mats, axis=0))
    adj = covisitation_adj(avg)
    # reference's O(N²P) loop (pygcn/utils.py:124-129)
    expected = np.zeros((8, 8))
    for i in range(8):
        for j in range(8):
            expected[i, j] = np.sum(avg[:, i] * avg[:, j])
    np.testing.assert_allclose(adj, expected, rtol=1e-5)


def test_load_or_build_adj_caching(tmp_path):
    rng = np.random.default_rng(0)
    mats = [rng.uniform(0, 2, (4, 6)) for _ in range(3)]
    a1 = load_or_build_adj("TestMSA", str(tmp_path), mats)
    assert os.path.exists(tmp_path / "adj_TestMSA.npy")
    a2 = load_or_build_adj("TestMSA", str(tmp_path))  # from cache
    np.testing.assert_allclose(a1, a2)


# ---------------------------------------------------------------------- #
# demographics with synthesized open-census files
# ---------------------------------------------------------------------- #


@pytest.fixture
def census_root(tmp_path):
    root = tmp_path
    msa = "SanFrancisco"
    full = calibration.MSA_NAME_FULL_DICT[msa]
    os.makedirs(root / msa, exist_ok=True)
    os.makedirs(root / "safegraph_open_census_data/data", exist_ok=True)

    cbgs = [10001, 10002, 10003]
    pd.DataFrame({"cbg_id": cbgs}).to_csv(root / msa / f"{full}_cbg_ids.csv", index=False)

    # age file: totals + male/female per detailed bucket
    age = {"census_block_group": cbgs, "B01001e1": [1000, 2000, 0]}
    for i in range(3, 50):
        age[f"B01001e{i}"] = [10, 20, 0]
    # make elders prominent in cbg 1: columns for 70+ are male e23..e25, female e47..e49
    for c in ("B01001e23", "B01001e24", "B01001e25", "B01001e47", "B01001e48", "B01001e49"):
        age[c] = [10, 100, 0]
    pd.DataFrame(age).to_csv(
        root / "safegraph_open_census_data/data/cbg_b01.csv", index=False
    )

    pd.DataFrame(
        {
            "census_block_group": cbgs,
            "total_households": [400, 800, 10],
            "mean_household_income": [50000.0, 90000.0, 30000.0],
        }
    ).to_csv(
        root / "safegraph_open_census_data/data/ACS_5years_Income_Filtered_Summary.csv",
        index=False,
    )

    occ = {"census_block_group": cbgs}
    for col in calibration.ew_rate_dict:
        occ[col] = [5, 10, 0]
    pd.DataFrame(occ).to_csv(
        root / "safegraph_open_census_data/data/cbg_c24.csv", index=False
    )
    return str(root), msa


def test_demographics_pipeline(census_root):
    root, msa = census_root
    sizes, elder, income, ew = load_cbg_demographics(msa, root)
    assert sizes.shape == (3, 1)
    np.testing.assert_allclose(sizes[:, 0], [1000, 2000, 1])  # zero pop → 1
    # elder ratio for cbg 1: 6 columns × (100+100) summed male+female per bucket
    # buckets 70-74, 75-79, 80-84, 85+: labels from e23..e25 pairs
    assert elder[1, 0] > elder[0, 0]
    np.testing.assert_allclose(income[:, 0], [50000, 90000, 30000])
    expected_ew = sum(calibration.ew_rate_dict.values()) * 5 / 1000
    np.testing.assert_allclose(ew[0, 0], expected_ew, rtol=1e-6)


def test_standardize():
    x = np.random.default_rng(0).normal(5, 3, (100, 2))
    z = standardize(x)
    np.testing.assert_allclose(z.mean(0), 0, atol=1e-5)
    np.testing.assert_allclose(z.std(0), 1, atol=1e-4)
