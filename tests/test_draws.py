"""Distribution tests for the while_loop-free exact samplers (sim/draws.py).

The epidemic simulator's exact mode replaces jax.random.binomial/poisson
(per-element rejection while_loops, 37x slower than approx on TPU) with
vectorized inversion + Hörmann transformed rejection. These tests check the
DISTRIBUTION against scipy's exact pmfs (chi-square), mean/variance, and the
tails — the reference's draws are ``np.random.binomial/poisson``
(reference disease_model.py:296,314,324,334-336), so distribution equality
is the parity contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from pygcn_tpu.sim.draws import binomial_exact, poisson_exact

S = 120_000


def _chi2_pval(samples, ks, pmf):
    obs = np.array([(samples == k).sum() for k in ks], float)
    exp = pmf * samples.size
    keep = exp > 5
    chi2 = ((obs[keep] - exp[keep]) ** 2 / exp[keep]).sum()
    return float(stats.chi2.sf(chi2, int(keep.sum()) - 1))


@pytest.mark.parametrize("lam", [0.3, 3.0, 9.9, 10.1, 50.0, 400.0])
def test_poisson_exact_distribution(lam):
    key = jax.random.key(int(lam * 100))
    s = np.asarray(poisson_exact(key, jnp.full((S,), lam, jnp.float32)))
    assert abs(s.mean() - lam) < 4 * np.sqrt(lam / S) + 1e-3
    assert abs(s.var() - lam) / lam < 0.05
    lo = int(max(0, lam - 6 * np.sqrt(lam + 1)))
    hi = int(lam + 6 * np.sqrt(lam + 1) + 10)
    ks = np.arange(lo, hi + 1)
    assert _chi2_pval(s, ks, stats.poisson.pmf(ks, lam)) > 1e-4
    assert (s >= 0).all()


@pytest.mark.parametrize("n,p", [
    (5, 0.3), (40, 0.1), (100, 0.5), (1000, 0.002),
    (1000, 0.3), (1000, 0.97), (20000, 0.4), (7, 0.9),
])
def test_binomial_exact_distribution(n, p):
    key = jax.random.key(n * 31 + int(p * 1000))
    s = np.asarray(binomial_exact(
        key, jnp.full((S,), float(n), jnp.float32), jnp.full((S,), p, jnp.float32)
    ))
    m, v = n * p, n * p * (1 - p)
    assert abs(s.mean() - m) < 4 * np.sqrt(v / S) + 1e-3
    assert abs(s.var() - v) / max(v, 1e-6) < 0.06
    assert s.min() >= 0 and s.max() <= n
    sd = max(np.sqrt(v), 1.0)
    lo = int(max(0, m - 6 * sd))
    hi = int(min(n, m + 6 * sd) + 5)
    ks = np.arange(lo, hi + 1)
    assert _chi2_pval(s, ks, stats.binom.pmf(ks, n, p)) > 1e-4


def test_binomial_edge_cases():
    key = jax.random.key(0)
    n = jnp.array([0.0, 10.0, 10.0, 1.0])
    p = jnp.array([0.5, 0.0, 1.0, 0.5])
    out = np.asarray(binomial_exact(key, n, p))
    assert out[0] == 0.0 and out[1] == 0.0 and out[2] == 10.0
    assert out[3] in (0.0, 1.0)
    # float n is floored like the reference's int cast
    out = np.asarray(binomial_exact(key, jnp.array([3.9]), jnp.array([1.0])))
    assert out[0] == 3.0


def test_mixed_regimes_one_call():
    """A single vectorized call spanning both branches (the simulator's state
    vectors mix tiny and huge counts) stays exact in each regime."""
    key = jax.random.key(7)
    lam = jnp.concatenate([jnp.full((S,), 0.5), jnp.full((S,), 200.0)])
    s = np.asarray(poisson_exact(key, lam))
    assert abs(s[:S].mean() - 0.5) < 0.02
    assert abs(s[S:].mean() - 200.0) < 0.5
    assert abs(s[S:].var() - 200.0) / 200.0 < 0.05


def test_draws_jit_and_grad_free_shapes():
    """Samplers compile under jit/vmap with 2-D state shapes ([S, N])."""
    key = jax.random.key(1)
    lam = jnp.abs(jax.random.normal(key, (8, 16))) * 20
    out = jax.jit(poisson_exact)(key, lam)
    assert out.shape == (8, 16) and bool((out >= 0).all())
    n = jnp.floor(jnp.abs(jax.random.normal(key, (8, 16))) * 50)
    out = jax.jit(binomial_exact)(key, n, jnp.full((8, 16), 0.3))
    assert out.shape == (8, 16) and bool((out <= n).all())
