"""End-to-end smoke tests for every CLI app (tiny configs, CPU)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.apps


@pytest.fixture(scope="module")
def gt_csv(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("gt") / "vac.csv")
    from pygcn_tpu.apps import gt_gen

    gt_gen.main([
        "--out", path, "--num_samples", "12", "--batch", "6",
        "--num_seeds", "2", "--hours", "48", "--n_cbgs", "32", "--NN", "4",
    ])
    assert os.path.exists(path)
    return path


def test_gt_gen_csv_format(gt_csv):
    import pandas as pd

    df = pd.read_csv(gt_csv)
    assert list(df.columns) == [
        "Vaccinated_Idxs", "Total_Cases", "Case_Rates_STD",
        "Total_Deaths", "Death_Rates_STD",
    ]
    assert len(df) == 13  # baseline + 12 samples
    assert df["Vaccinated_Idxs"].iloc[0] == "[]"
    assert (df["Total_Cases"] >= 0).all()


def test_gt_gen_grouping_and_safety(tmp_path):
    from pygcn_tpu.apps import gt_gen

    path = str(tmp_path / "vac_g.csv")
    gt_gen.main([
        "--out", path, "--num_samples", "4", "--batch", "4", "--num_seeds", "2",
        "--hours", "48", "--n_cbgs", "32", "--NN", "3",
        "--grouping", "--safe_distance", "0.05", "--shards", "2",
    ])
    import pandas as pd

    assert len(pd.read_csv(path)) == 5


def test_gt_gen_randombag(tmp_path):
    """G8 stratified-randombag mode (reference gt-gen-vac-randombag.py):
    bags with merged small groups, flood distribution per bag, Gini equity
    columns relative to the no-vac baseline."""
    from pygcn_tpu.apps import gt_gen

    path = str(tmp_path / "vac_rb.csv")
    gt_gen.main([
        "--out", path, "--randombag", "--num_groupwise", "2", "--batch", "8",
        "--num_seeds", "2", "--hours", "48", "--n_cbgs", "48",
        "--vaccination_ratio", "0.05",
    ])
    import pandas as pd

    df = pd.read_csv(path)
    for col in ("Hybrid_Group", "Fatality_Rate_Abs", "Fatality_Rate_Rel",
                "Age_Gini_Abs", "Age_Gini_Rel",
                "Mean_Household_Income_Gini_Abs", "Essential_Worker_Gini_Rel"):
        assert col in df.columns
    # row 0 is the no-vac baseline: rel columns identically 0
    assert df["Vaccinated_Idxs"].iloc[0] == "[]"
    assert df["Fatality_Rate_Rel"].iloc[0] == 0.0
    assert df["Age_Gini_Rel"].iloc[0] == 0.0
    # every bag contributed num_groupwise samples
    bags = df["Hybrid_Group"].iloc[1:]
    assert (bags.value_counts() == 2).all()
    assert len(df) == 1 + 2 * bags.nunique()
    # vaccinated sets are non-empty and within range
    import ast

    for s in df["Vaccinated_Idxs"].iloc[1:]:
        idxs = ast.literal_eval(s)
        assert len(idxs) > 0 and max(idxs) < 48
    # Gini columns are valid coefficients
    assert ((df["Age_Gini_Abs"] >= 0) & (df["Age_Gini_Abs"] <= 1)).all()


def test_train_evaluator_and_generator(gt_csv, tmp_path):
    from pygcn_tpu.apps import train_evaluator, train_generator

    out_dir = str(tmp_path / "eval")
    test_loss, _ = train_evaluator.main([
        "--vac_result_path", gt_csv, "--out_dir", out_dir,
        "--epochs", "3", "--n_cbgs", "32", "--hours", "48", "--NN", "4",
        "--batch_size", "4",
    ])
    assert np.isfinite(test_loss)
    assert os.path.exists(os.path.join(out_dir, "evaluator.pkl"))
    assert os.path.exists(os.path.join(out_dir, "checkpoint_minloss.pkl"))

    gen_dir = str(tmp_path / "gen")
    results = train_generator.main([
        "--evaluator", os.path.join(out_dir, "evaluator.pkl"),
        "--out_dir", gen_dir, "--epochs", "4", "--num_seeds", "2",
        "--n_cbgs", "32", "--hours", "48", "--NN", "4", "--max_validate", "1",
    ])
    assert len(results) >= 1
    assert len(results[0]["policy"]) == 4

    hier_dir = str(tmp_path / "hier")
    results = train_generator.main([
        "--evaluator", os.path.join(out_dir, "evaluator.pkl"),
        "--out_dir", hier_dir, "--epochs", "3", "--num_seeds", "2",
        "--n_cbgs", "32", "--hours", "48", "--NN", "4", "--max_validate", "1",
        "--hierarchical",
    ])
    assert len(results) >= 1


def test_predict_serving(gt_csv, tmp_path):
    """Batch-inference CLI: pkl mode, export artifact, and from-export mode
    produce identical predictions."""
    import pandas as pd

    from pygcn_tpu.apps import predict, train_evaluator

    out_dir = str(tmp_path / "eval_srv")
    train_evaluator.main([
        "--vac_result_path", gt_csv, "--out_dir", out_dir,
        "--epochs", "1", "--n_cbgs", "32", "--hours", "48", "--NN", "4",
        "--batch_size", "4",
    ])
    ev = os.path.join(out_dir, "evaluator.pkl")
    common = ["--n_cbgs", "32", "--hours", "48", "--NN", "4", "--batch", "8"]

    out1 = str(tmp_path / "preds1.csv")
    art = str(tmp_path / "evaluator.shlo")
    preds1 = predict.main([
        "--evaluator", ev, "--policies_csv", gt_csv, "--random", "3",
        "--out", out1, "--export", art, *common,
    ])
    df = pd.read_csv(out1)
    assert list(df.columns) == ["Vaccinated_Idxs", "Prediction"]
    assert len(df) == len(preds1) and len(preds1) == 13 + 3  # csv rows + random
    assert np.isfinite(preds1).all()

    out2 = str(tmp_path / "preds2.csv")
    preds2 = predict.main([
        "--from_export", art, "--policies_csv", gt_csv, "--random", "3",
        "--out", out2, *common,
    ])
    np.testing.assert_array_equal(preds1, preds2)


def test_train_evaluator_bf16(gt_csv, tmp_path):
    """--bf16 (bf16 compute, f32 master params) trains to a finite loss."""
    from pygcn_tpu.apps import train_evaluator

    out_dir = str(tmp_path / "eval_bf16")
    test_loss, _ = train_evaluator.main([
        "--vac_result_path", gt_csv, "--out_dir", out_dir,
        "--epochs", "3", "--n_cbgs", "32", "--hours", "48", "--NN", "4",
        "--batch_size", "4", "--bf16",
    ])
    assert np.isfinite(test_loss)


def test_train_evaluator_resume(gt_csv, tmp_path):
    from pygcn_tpu.apps import train_evaluator

    out_dir = str(tmp_path / "eval_resume")
    train_evaluator.main([
        "--vac_result_path", gt_csv, "--out_dir", out_dir,
        "--epochs", "2", "--n_cbgs", "32", "--hours", "48", "--NN", "4",
        "--batch_size", "4",
    ])
    # resume must pick up the checkpoint and continue without error
    train_evaluator.main([
        "--vac_result_path", gt_csv, "--out_dir", out_dir,
        "--epochs", "2", "--n_cbgs", "32", "--hours", "48", "--NN", "4",
        "--batch_size", "4", "--resume",
    ])


def test_train_rl(tmp_path):
    from pygcn_tpu.apps import train_rl

    final_cases, baseline = train_rl.main([
        "--out_dir", str(tmp_path / "rl"), "--episodes", "2",
        "--epoch_width", "6", "--num_seeds", "2", "--n_cbgs", "32",
        "--hours", "48", "--NN", "3",
    ])
    assert np.isfinite(final_cases) and np.isfinite(baseline)
    # cache persisted
    assert any(f.startswith("sim_cache") for f in os.listdir(tmp_path / "rl"))


def test_train_cora_synthetic():
    from pygcn_tpu.apps import train_cora

    acc = train_cora.main(["--epochs", "60", "--synthetic_nodes", "400", "--fastmode"])
    assert acc > 0.6


def test_train_legacy(gt_csv):
    from pygcn_tpu.apps import train_legacy

    loss = train_legacy.main([
        "--vac_result_path", gt_csv, "--epochs", "5",
        "--n_cbgs", "32", "--hours", "48",
    ])
    assert np.isfinite(loss)


def test_baselines(gt_csv):
    from pygcn_tpu.apps import baselines

    mse, corr = baselines.main([
        "mlp", "--vac_result_path", gt_csv, "--epochs", "3",
        "--n_cbgs", "32", "--hours", "48", "--batch_size", "4",
    ])
    assert np.isfinite(mse)
    baselines.main(["summary-ols", "--vac_result_path", gt_csv,
                    "--n_cbgs", "32", "--hours", "48"])
    baselines.main(["summary-mlp", "--vac_result_path", gt_csv,
                    "--epochs", "5", "--n_cbgs", "32", "--hours", "48"])


def test_no_vac_and_export(tmp_path):
    from pygcn_tpu.apps import export_dynalearn, no_vac_baseline

    gt_dir = str(tmp_path / "gt")
    no_vac_baseline.main([
        "--out_dir", gt_dir, "--num_seeds", "2", "--hours", "48",
        "--n_cbgs", "32",
    ])
    assert os.path.exists(
        os.path.join(gt_dir, "cases_cbg_no_vaccination_SanFrancisco_2seeds.npy")
    )
    import h5py

    for gc in (0, 1, 3):
        out = export_dynalearn.main([
            "--gt_dir", gt_dir, "--gen_code", str(gc), "--num_seeds", "2",
        ])
        with h5py.File(out, "r") as f:
            assert "timeseries" in f and "networks" in f
            assert f["inputs"].shape[3] == 5  # lag window


def test_graft_entry_single_and_multichip():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.asarray(out).shape == (4, 1)
    ge.dryrun_multichip(8)


def test_train_fullgraph():
    from pygcn_tpu.apps import train_fullgraph

    dt = train_fullgraph.main([
        "--n_nodes", "1500", "--avg_degree", "5", "--feat_dim", "16",
        "--hidden", "16", "--epochs", "2", "--layers", "3", "--remat",
    ])
    assert dt > 0


def test_train_fullgraph_gat():
    from pygcn_tpu.apps import train_fullgraph

    dt = train_fullgraph.main([
        "--n_nodes", "400", "--avg_degree", "5", "--feat_dim", "8",
        "--hidden", "4", "--n_classes", "3", "--epochs", "2",
        "--model", "gat", "--gat_heads", "2",
    ])
    assert dt > 0


def test_train_fullgraph_clustered_convergence():
    """--clustered drives the convergence pipeline (community labels, LP
    ordering, hybrid layout, early stopping) and actually learns."""
    from pygcn_tpu.apps import train_fullgraph

    r = train_fullgraph.main([
        "--clustered", "--n_nodes", "800", "--avg_degree", "8",
        "--feat_dim", "16", "--hidden", "16", "--n_classes", "4",
        "--max_epochs", "40", "--patience", "6", "--layers", "2",
    ])
    assert r["val"] > 0.5 and np.isfinite(r["test"]), r

    # GAT variant exercises the tile/slot routing decision end-to-end
    r = train_fullgraph.main([
        "--clustered", "--n_nodes", "800", "--avg_degree", "8",
        "--feat_dim", "16", "--hidden", "4", "--n_classes", "4",
        "--max_epochs", "15", "--patience", "5",
        "--model", "gat", "--gat_heads", "2",
    ])
    assert np.isfinite(r["val"]), r


def test_train_fullgraph_npz(tmp_path):
    """An EXTERNALLY-authored .npz in the documented interchange schema
    (README "Real datasets": ogbn-style edge_index/features/labels/idx_*,
    raw — no save_npz_dataset markers) trains to converged accuracy via
    --npz. This pins the path real ogbn-arxiv/Reddit exports would take
    (the reference's own loader is disabled upstream, pygcn/utils.py:343-383)."""
    from pygcn_tpu.apps import train_fullgraph

    rng = np.random.default_rng(0)
    n_blk, blk = 3, 50
    n = n_blk * blk
    labels = np.repeat(np.arange(n_blk), blk)
    # SBM: dense intra-block, sparse inter-block; directed edge list with
    # both orientations listed explicitly (as ogbn exports do)
    p = np.where(labels[:, None] == labels[None, :], 0.15, 0.01)
    a = rng.random((n, n)) < p
    np.fill_diagonal(a, False)
    a = a | a.T
    recv, send = np.nonzero(a)
    feats = (np.eye(n_blk)[labels] * 2.0 + rng.normal(size=(n, n_blk))
             ).astype(np.float32)
    idx = rng.permutation(n)
    path = str(tmp_path / "ogbn_style.npz")
    np.savez(
        path,
        edge_index=np.stack([recv, send]).astype(np.int64),  # [2, E]
        features=feats,  # [N, F]
        labels=labels.astype(np.int64),  # [N]
        idx_train=idx[:60], idx_val=idx[60:100], idx_test=idx[100:],
    )
    r = train_fullgraph.main(["--npz", path, "--epochs", "60",
                              "--hidden", "16", "--layers", "2"])
    assert r["val"] >= 0.8 and r["test"] >= 0.8, r


def test_train_fullgraph_extension_models():
    from pygcn_tpu.apps import train_fullgraph

    for model in ("sage", "gin", "appnp"):
        dt = train_fullgraph.main([
            "--n_nodes", "400", "--avg_degree", "5", "--feat_dim", "8",
            "--hidden", "8", "--n_classes", "3", "--epochs", "2",
            "--model", model,
        ])
        assert dt > 0, model


def test_train_fullgraph_sharded():
    """--shards N drives the halo-exchange DistGCN path from the CLI."""
    from pygcn_tpu.apps import train_fullgraph

    dt = train_fullgraph.main([
        "--n_nodes", "600", "--avg_degree", "5", "--feat_dim", "8",
        "--hidden", "8", "--n_classes", "3", "--epochs", "2", "--layers", "2",
        "--shards", "4",
    ])
    assert dt > 0


def test_train_fullgraph_sharded_families():
    """--shards reaches the distributed GAT/SAGE/APPNP modules too."""
    from pygcn_tpu.apps import train_fullgraph

    for model in ("gatv2", "sage"):
        dt = train_fullgraph.main([
            "--n_nodes", "300", "--avg_degree", "5", "--feat_dim", "8",
            "--hidden", "4", "--n_classes", "3", "--epochs", "1",
            "--shards", "4", "--model", model, "--gat_heads", "2",
        ])
        assert dt > 0


def test_train_sampled():
    from pygcn_tpu.apps import train_sampled

    acc = train_sampled.main([
        "--n_nodes", "2000", "--fanouts", "5", "5", "--batch_size", "128",
        "--epochs", "1",
    ])
    assert 0.0 <= acc <= 1.0


def test_train_sampled_data_parallel():
    from pygcn_tpu.apps import train_sampled

    acc = train_sampled.main([
        "--n_nodes", "1500", "--fanouts", "4", "4", "--batch_size", "128",
        "--epochs", "1", "--shards", "4",
    ])
    assert 0.0 <= acc <= 1.0


def test_train_sampled_feature_sharded():
    from pygcn_tpu.apps import train_sampled

    acc = train_sampled.main([
        "--n_nodes", "1500", "--fanouts", "4", "4", "--batch_size", "128",
        "--epochs", "1", "--shards", "4", "--feature_sharded",
    ])
    assert 0.0 <= acc <= 1.0


def test_train_sampled_locality_aligned():
    from pygcn_tpu.apps import train_sampled

    acc = train_sampled.main([
        "--n_nodes", "1500", "--fanouts", "4", "4", "--batch_size", "128",
        "--epochs", "1", "--shards", "4", "--feature_sharded",
        "--align_seeds", "--locality",
    ])
    assert 0.0 <= acc <= 1.0


def test_train_sampled_gat():
    from pygcn_tpu.apps import train_sampled

    acc = train_sampled.main([
        "--n_nodes", "1500", "--fanouts", "4", "4", "--batch_size", "128",
        "--epochs", "1", "--model", "gat", "--gat_heads", "2", "--hidden", "8",
    ])
    assert 0.0 <= acc <= 1.0


def test_train_evaluator_data_parallel(gt_csv, tmp_path):
    from pygcn_tpu.apps import train_evaluator

    test_loss, _ = train_evaluator.main([
        "--vac_result_path", gt_csv, "--out_dir", str(tmp_path / "dp"),
        "--epochs", "2", "--n_cbgs", "32", "--hours", "48", "--NN", "4",
        "--batch_size", "8", "--data_parallel",
    ])
    assert np.isfinite(test_loss)
