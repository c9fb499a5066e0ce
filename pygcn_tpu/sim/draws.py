"""TPU-friendly exact count sampling: vectorized binomial/Poisson.

The reference draws ``np.random.binomial`` / ``np.random.poisson`` inside the
epidemic hot loop (reference ``disease_model.py:296,314,324,334-336``).
``jax.random.binomial``/``poisson`` are distribution-exact but lower to
per-element rejection ``while_loop``s that serialize on TPU — measured 37×
slower than the approximate sampler at production scale (DEMO.md r1).

These samplers are exact in distribution with NO ``while_loop``:

- small means use truncated CDF inversion (fixed ``_K_INV`` unrolled steps of
  pure VPU math; residual tail mass < 1e-9 at the ``_SPLIT=10`` cutover);
- large means use Hörmann's transformed-rejection algorithms (BTRS for
  binomial, PTRS for Poisson — the same algorithms NumPy/TF use) with a
  bounded, fully vectorized retry budget: ``_ROUNDS`` candidate draws are
  evaluated for every element simultaneously and the first acceptance wins.
  Acceptance per round is ≳ 0.86, so the probability an element exhausts all
  rounds is < 1e-10; such elements fall back to a stochastically-rounded
  Gaussian (statistically indistinguishable at that rate).

Both branches are computed and selected with ``where`` — all lanes run the
same straight-line code, the TPU-native trade.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_SPLIT = 10.0  # mean threshold: inversion below, transformed rejection above
_K_INV = 36  # inversion steps; P(X > 36 | mean=10) < 1e-11
_ROUNDS = 12  # vectorized rejection rounds; residual failure < 1e-10

# Stirling tail f(k) = lgamma(k+1) - [(k+1/2)·log(k+1) - (k+1) + log(2π)/2]
# (a host-side numpy constant: this module may be first-imported inside a
# trace, where creating a jnp constant captures the ambient tracer context)
_STIRLING_TAIL = np.array([
    0.0810614667953272, 0.0413406959554092, 0.0276779256849983,
    0.0207906721037650, 0.0166446911898211, 0.0138761288230707,
    0.0118967099458917, 0.0104112652619720, 0.0092554621827127,
    0.0083305634333286,
], dtype=np.float32)


def _stirling_tail(k):
    kp = k + 1.0
    out = (1.0 / 12 - (1.0 / 360 - 1.0 / 1260 / (kp * kp)) / (kp * kp)) / kp
    # small-k table via a branchless select chain, NOT jnp.take: a 262K-row
    # gather costs ~1 ms on TPU and this runs 4x per rejection round — the
    # gathers were 85% of binomial_exact's runtime (PERF_NOTES r2)
    for i in range(9, -1, -1):
        out = jnp.where(k < i + 0.5, _STIRLING_TAIL[i], out)
    return out


def _first_accepted(ks, oks, fallback):
    """Select each element's first accepted candidate across rounds."""
    out = fallback
    for r in range(_ROUNDS - 1, -1, -1):
        out = jnp.where(oks[r], ks[r], out)
    return out


def poisson_exact(key, lam) -> jax.Array:
    """Poisson(lam) draws, float32, exact in distribution, no while_loop."""
    lam = jnp.asarray(lam, jnp.float32)
    shape = jnp.shape(lam)
    k_inv, k_rej, k_fb = jax.random.split(key, 3)

    # --- branch A: truncated CDF inversion (lam <= _SPLIT) ----------------
    lam_s = jnp.clip(lam, 0.0, _SPLIT)
    u = jax.random.uniform(k_inv, shape)
    pk = jnp.exp(-lam_s)
    cdf = pk
    count = jnp.zeros_like(lam)
    for k in range(1, _K_INV + 1):
        count = count + (u > cdf)
        pk = pk * lam_s / k
        cdf = cdf + pk
    small = count

    # --- branch B: PTRS transformed rejection (lam > _SPLIT) --------------
    # gated behind lax.cond: the simulator's per-hour draws are usually all
    # small-mean, and the rejection machinery is the expensive part
    def _ptrs(keys):
        k_rej, k_fb = keys
        lam_l = jnp.maximum(lam, _SPLIT)
        log_lam = jnp.log(lam_l)
        b = 0.931 + 2.53 * jnp.sqrt(lam_l)
        a = -0.059 + 0.02483 * b
        inv_alpha = 1.1239 + 1.1328 / (b - 3.4)
        v_r = 0.9277 - 3.6224 / (b - 2.0)

        us_all = jax.random.uniform(k_rej, (2, _ROUNDS) + shape)
        ks, oks = [], []
        for r in range(_ROUNDS):
            u_r = us_all[0, r] - 0.5
            v_r_draw = us_all[1, r]
            us = 0.5 - jnp.abs(u_r)
            k = jnp.floor((2.0 * a / us + b) * u_r + lam_l + 0.43)
            accept_fast = (us >= 0.07) & (v_r_draw <= v_r)
            reject_early = (k < 0.0) | ((us < 0.013) & (v_r_draw > us))
            log_acc = (
                jnp.log(v_r_draw * inv_alpha / (a / (us * us) + b))
                <= k * log_lam - lam_l - jax.lax.lgamma(k + 1.0)
            )
            ok = ~reject_early & (accept_fast | log_acc) & (k >= 0.0)
            ks.append(k)
            oks.append(ok)

        z = jax.random.normal(k_fb, shape)
        uf = us_all[0, 0]  # reuse a uniform for the fallback's rounding
        fallback = jnp.clip(jnp.floor(lam_l + jnp.sqrt(lam_l) * z + uf), 0.0, None)
        return _first_accepted(ks, oks, fallback)

    large = jax.lax.cond(
        jnp.any(lam > _SPLIT), _ptrs, lambda _: jnp.zeros_like(lam), (k_rej, k_fb)
    )
    return jnp.where(lam <= _SPLIT, small, large).astype(jnp.float32)


def binomial_exact(key, n, p) -> jax.Array:
    """Binomial(n, p) draws, float32, exact in distribution, no while_loop.

    ``n`` may be float (floored), any shape broadcastable with ``p``.
    """
    n = jnp.floor(jnp.asarray(n, jnp.float32))
    p = jnp.clip(jnp.asarray(p, jnp.float32), 0.0, 1.0)
    n, p = jnp.broadcast_arrays(n, p)
    shape = jnp.shape(n)
    k_inv, k_rej, k_fb = jax.random.split(key, 3)

    # symmetry: sample with p' = min(p, 1-p), mirror at the end
    flip = p > 0.5
    q = jnp.where(flip, 1.0 - p, p)
    q = jnp.clip(q, 0.0, 0.5)
    mean = n * q

    # --- branch A: truncated CDF inversion (mean <= _SPLIT) ---------------
    # pmf recurrence p_{k+1} = p_k · (n-k)/(k+1) · q/(1-q); p_0 = (1-q)^n via
    # exp(n·log1p(-q)) (safe: q <= 0.5)
    u = jax.random.uniform(k_inv, shape)
    oq = 1.0 - q
    ratio = q / jnp.maximum(oq, 1e-30)
    pk = jnp.exp(n * jnp.log1p(-q))
    cdf = pk
    count = jnp.zeros_like(n)
    for k in range(_K_INV):
        count = count + (u > cdf)
        pk = pk * jnp.clip(n - k, 0.0, None) / (k + 1.0) * ratio
        cdf = cdf + pk
    small = jnp.minimum(count, n)

    # --- branch B: BTRS transformed rejection (mean > _SPLIT) -------------
    # gated behind lax.cond — most of the simulator's binomial draws are
    # all-small-mean, and BTRS is the expensive part
    def _btrs(keys):
        k_rej, k_fb = keys
        # guard the constants against the small-mean lanes (selected away)
        nb = jnp.maximum(n, 1.0)
        qb = jnp.clip(q, _SPLIT / jnp.maximum(nb, _SPLIT + 1.0), 0.5)
        spq = jnp.sqrt(nb * qb * (1.0 - qb))
        b = 1.15 + 2.53 * spq
        a = -0.0873 + 0.0248 * b + 0.01 * qb
        c = nb * qb + 0.5
        v_thresh = 0.92 - 4.2 / b
        r = qb / (1.0 - qb)
        alpha = (2.83 + 5.1 / b) * spq
        m = jnp.floor((nb + 1.0) * qb)
        stirling_m = _stirling_tail(m) + _stirling_tail(nb - m)

        us_all = jax.random.uniform(k_rej, (2, _ROUNDS) + shape)
        ks, oks = [], []
        for rd in range(_ROUNDS):
            u_r = us_all[0, rd] - 0.5
            v = us_all[1, rd]
            us = 0.5 - jnp.abs(u_r)
            k = jnp.floor((2.0 * a / us + b) * u_r + c)
            in_range = (k >= 0.0) & (k <= nb)
            accept_fast = (us >= 0.07) & (v <= v_thresh) & in_range
            v2 = jnp.log(v * alpha / (a / (us * us) + b))
            kc = jnp.clip(k, 0.0, nb)
            ub = (
                (m + 0.5) * jnp.log((m + 1.0) / (r * (nb - m + 1.0)))
                + (nb + 1.0) * jnp.log((nb - m + 1.0) / (nb - kc + 1.0))
                + (kc + 0.5) * jnp.log(r * (nb - kc + 1.0) / (kc + 1.0))
                + stirling_m
                - _stirling_tail(kc)
                - _stirling_tail(nb - kc)
            )
            ok = accept_fast | (in_range & (v2 <= ub))
            ks.append(k)
            oks.append(ok)

        z = jax.random.normal(k_fb, shape)
        uf = us_all[0, 0]
        fallback = jnp.clip(jnp.floor(nb * qb + spq * z + uf), 0.0, nb)
        return _first_accepted(ks, oks, fallback)

    large = jax.lax.cond(
        jnp.any(mean > _SPLIT), _btrs, lambda _: jnp.zeros_like(n), (k_rej, k_fb)
    )
    out = jnp.where(mean <= _SPLIT, small, large)
    out = jnp.where(flip, n - out, out)
    return jnp.clip(out, 0.0, n).astype(jnp.float32)
