"""Factory and plotting coverage (PARITY C16 / C27)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from pygcn_tpu.graph import Graph, sym_normalize, symmetrize_max
from pygcn_tpu.nn.models import get_model
from pygcn_tpu.utils.config import Config


def _graph(n=40):
    rng = np.random.default_rng(0)
    m = sp.coo_matrix(
        (rng.uniform(0.1, 1.0, 300), (rng.integers(0, n, 300), rng.integers(0, n, 300))),
        shape=(n, n),
    )
    return Graph.from_scipy(
        sym_normalize(symmetrize_max(m)), is_symmetric=True, build_dense=True
    )


@pytest.mark.parametrize(
    "name", ["GCN", "MLP", "GNN_OVER_MLP", "Generator",
             "Hierarchical_Generator", "SoftGenerator", "KipfGCN"]
)
def test_get_model_factory_builds_and_runs(name):
    """Every reference model name (pygcn/models.py:440-460) constructs and
    produces a finite forward pass."""
    n, feat, dt = 40, 9, 8
    cfg = Config(
        gcn_nfeat=dt, gcn_nhid=8, gcn_nclass=8, dim_touched=dt, NN=4,
        linear_nin=8 + (feat - dt) - 1, linear_nhid1=8, linear_nhid2=4,
        linear_nout=1,
    )
    g = _graph(n)
    rng = np.random.default_rng(1)
    model = get_model(cfg, name)
    params = model.init(jax.random.key(0))

    if name == "GNN_OVER_MLP":
        x = rng.normal(size=(2, n, feat)).astype(np.float32)
        x[:, :, -1] = (rng.uniform(size=(2, n)) < 0.3).astype(np.float32)
        out = model.apply(params, jnp.asarray(x), g)
        assert out.shape == (2, 1)
    elif name == "GCN":
        x = rng.normal(size=(n, dt)).astype(np.float32)
        out = model.apply(params, jnp.asarray(x), g)
        assert out.shape[-1] == 1
    elif name == "MLP":
        cfgm = Config(linear_nin=feat - 1, linear_nhid1=8, linear_nhid2=4, linear_nout=1)
        model = get_model(cfgm, name)
        params = model.init(jax.random.key(0))
        x = rng.normal(size=(2, n, feat)).astype(np.float32)
        x[:, :, -1] = (rng.uniform(size=(2, n)) < 0.3).astype(np.float32)
        out = model.apply(params, jnp.asarray(x))
        assert out.shape == (2, 1)
    elif name == "KipfGCN":
        x = rng.normal(size=(n, dt)).astype(np.float32)
        out = model.apply(params, jnp.asarray(x), g)
        assert out.shape == (n, 8)
    elif name == "SoftGenerator":
        x = rng.normal(size=(n, feat - 1)).astype(np.float32)
        scores = model.apply(params, jnp.asarray(x), g)
        s = np.asarray(scores).reshape(-1)
        assert s.shape == (n,) and abs(s.sum() - 1.0) < 1e-4
    else:  # Generator / Hierarchical_Generator
        x = rng.normal(size=(n, feat - 1)).astype(np.float32)
        if name == "Hierarchical_Generator":
            x[:, -1] = rng.integers(0, 3, n)  # group id; target_group=0 excluded
        flag = model.apply(params, jnp.asarray(x), g)
        f = np.asarray(flag).reshape(-1)
        assert (np.count_nonzero(f) <= 4) and np.all(np.isfinite(f))

    with pytest.raises(ValueError):
        get_model(cfg, "NoSuchModel")


def test_visualize_and_curves_write_png(tmp_path):
    from pygcn_tpu.utils.visualize import plot_curves, visualize

    h = str(tmp_path / "hist.png")
    visualize(np.random.default_rng(0).normal(size=200), bins=20, save_path=h)
    assert os.path.getsize(h) > 0

    c = str(tmp_path / "curves.png")
    plot_curves({"train": [3, 2, 1], "val": [4, 3, 2.5]}, save_path=c)
    assert os.path.getsize(c) > 0


def test_numpy_ols_matches_scipy_linregress():
    """The closed-form OLS inference stats (se/t/p/R2/F) match scipy's
    reference implementation in the single-regressor case (the reference
    prints statsmodels summary(); regression.py:163-185)."""
    from scipy import stats

    from pygcn_tpu.apps.baselines import numpy_ols

    rng = np.random.default_rng(0)
    x = rng.normal(size=(60, 1))
    y = 2.5 * x[:, 0] + 1.0 + rng.normal(scale=0.5, size=60)
    fit = numpy_ols(x, y)
    ref = stats.linregress(x[:, 0], y)
    np.testing.assert_allclose(fit["coef"][1], ref.slope, rtol=1e-10)
    np.testing.assert_allclose(fit["coef"][0], ref.intercept, rtol=1e-10)
    np.testing.assert_allclose(fit["se"][1], ref.stderr, rtol=1e-8)
    np.testing.assert_allclose(fit["p"][1], ref.pvalue, rtol=1e-8)
    np.testing.assert_allclose(fit["r2"], ref.rvalue**2, rtol=1e-10)
    # single regressor: F == t^2 and the p-values agree
    np.testing.assert_allclose(fit["f_stat"], fit["t"][1] ** 2, rtol=1e-8)
    np.testing.assert_allclose(fit["f_pval"], ref.pvalue, rtol=1e-8)
