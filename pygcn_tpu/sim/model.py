"""Metapopulation epidemic simulator — the TPU-native rebuild of the
reference's ``gt-generator/disease_model.py`` (``Model``, lines 5-346).

Re-architecture
---------------
The reference advances a NumPy ``(num_seeds, N)`` state through a 1512-hour
Python ``while`` loop with two sparse matmuls per hour. Here:

- the hour loop is a ``lax.scan`` (outer scan over recording blocks, inner
  scan over the ``verbosity`` hours within a block, so histories are recorded
  once per block without materializing per-hour state);
- Monte-Carlo seeds are a batch axis of every state array and draw ([S, N]);
- the two per-hour sparse products (POI infection rates ``V @ density`` and
  CBG cases ``rates @ V``, reference ``disease_model.py:311,319-321``) run
  node-major over a static padded COO visit sequence (optionally periodic,
  e.g. one week of hourly matrices reused) with the seed axis as contiguous
  wide rows — one gather + one segment scatter each (``_segment_matmul``);
- horizons whose visit buffers exceed HBM stream host pages through
  ``simulate_paged`` (double-buffered, bit-identical to ``simulate``);
- the stochastic draws (binomial seeding/transitions, Poisson POI infections)
  use ``jax.random`` with keys threaded through the scan.

Faithfulness: update order, clipping semantics (rates clipped to 1, POI cases
clipped to susceptibles, NaN→0), the vaccination-time switch of attack rates,
the clipping monitor counters, and the global freeze once the epidemic dies
(reference ``disease_model.py:200-206`` stops *all* updates — including pending
confirmations — once ``max(L+I) < 1`` across seeds) are all reproduced.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class VisitSeq:
    """Padded COO sequence of hourly POI×CBG visit matrices.

    ``poi_idx/cbg_idx/w`` have shape [period, E_max]; hour ``t`` uses row
    ``t % period`` (period == total hours for non-periodic data). Padding
    entries carry weight 0 and index 0.
    """

    poi_idx: jax.Array
    cbg_idx: jax.Array
    w: jax.Array
    n_pois: int
    n_cbgs: int
    period: int

    @staticmethod
    def from_dense(mats: np.ndarray) -> "VisitSeq":
        """``mats``: [T, M, N] dense hourly visit matrices."""
        poi, cbg, w, m, n = _pack_dense(np.asarray(mats))
        return VisitSeq(
            poi_idx=jnp.asarray(poi), cbg_idx=jnp.asarray(cbg), w=jnp.asarray(w),
            n_pois=m, n_cbgs=n, period=poi.shape[0],
        )

    @staticmethod
    def from_scipy(mats) -> "VisitSeq":
        """``mats``: list of scipy sparse M×N hourly matrices."""
        poi, cbg, w, m, n = _pack_scipy(mats)
        return VisitSeq(
            poi_idx=jnp.asarray(poi), cbg_idx=jnp.asarray(cbg), w=jnp.asarray(w),
            n_pois=m, n_cbgs=n, period=poi.shape[0],
        )


def _pack_dense(mats: np.ndarray):
    """[T, M, N] dense hourly matrices → padded COO ([T,E] poi/cbg/w, M, N)."""
    t, m, n = mats.shape
    coos = [np.nonzero(mats[i]) for i in range(t)]
    e_max = max(max((len(c[0]) for c in coos), default=1), 1)
    e_max = -(-e_max // 8) * 8
    poi = np.zeros((t, e_max), np.int32)
    cbg = np.zeros((t, e_max), np.int32)
    w = np.zeros((t, e_max), np.float32)
    for i, (pi, ci) in enumerate(coos):
        poi[i, : pi.size] = pi
        cbg[i, : ci.size] = ci
        w[i, : ci.size] = mats[i][pi, ci]
    return poi, cbg, w, m, n


def _pack_scipy(mats):
    """List of scipy sparse M×N hourly matrices → padded COO arrays."""
    t = len(mats)
    m, n = mats[0].shape
    coos = [mm.tocoo() for mm in mats]
    e_max = max(max((c.nnz for c in coos), default=1), 1)
    e_max = -(-e_max // 8) * 8
    poi = np.zeros((t, e_max), np.int32)
    cbg = np.zeros((t, e_max), np.int32)
    w = np.zeros((t, e_max), np.float32)
    for i, c in enumerate(coos):
        poi[i, : c.nnz] = c.row
        cbg[i, : c.nnz] = c.col
        w[i, : c.nnz] = c.data
    return poi, cbg, w, m, n


jax.tree_util.register_dataclass(
    VisitSeq,
    data_fields=["poi_idx", "cbg_idx", "w"],
    meta_fields=["n_pois", "n_cbgs", "period"],
)


@dataclasses.dataclass(frozen=True)
class EpidemicParams:
    """Exogenous parameters (reference ``init_exogenous_variables``,
    ``disease_model.py:24-111``)."""

    poi_factors: jax.Array  # ψ·d²/a per POI [M]
    cbg_sizes: jax.Array  # populations [N]
    attack_orig: jax.Array  # [N]
    attack_vac: jax.Array  # post-vaccination [N]
    death_orig: jax.Array  # [N]
    death_vac: jax.Array  # [N]
    home_beta: float
    p_sick_at_t0: float
    vaccination_time: int
    total_hours: int
    psi: float
    latency_period: float = 96.0
    infectious_period: float = 84.0
    confirmation_rate: float = 0.1
    confirmation_lag: float = 168.0
    death_lag: float = 432.0
    clip_poisson_approximation: bool = True
    # opt-in moment-matched Gaussian draws with stochastic rounding: much
    # faster on TPU than exact rejection-sampled binomial/Poisson. Mean/var
    # matched; a small upward bias remains in very-low-mean regimes (the
    # clip-at-zero tail). Default False = reference-exact distributions.
    approx_draws: bool = False
    # R0-calibration mode (reference ``disease_model.py:234-258``): new cases
    # are parked directly in ``removed`` instead of entering ``latent``, so
    # only the initial seeds ever become infectious and ``total_affected``
    # counts seeds + the secondary infections they caused (the R0 estimate);
    # confirmation/death bookkeeping is suppressed. NOTE the reference's
    # second r0 gate (``disease_model.py:305``) skips the POI term of
    # get_new_cases but then dereferences the undefined ``num_cases_from_poi``
    # at line 331 — a NameError on any run with visit data, i.e. dead code
    # (every reference driver passes just_compute_r0=False). This rebuild
    # keeps the full new-case computation (POI + home) and gates only the
    # state update, which is the runnable, scientifically meaningful form.
    just_compute_r0: bool = False

    @staticmethod
    def build(
        *,
        poi_areas,
        cbg_sizes,
        total_hours: int,
        p_sick_at_t0: float,
        vaccination_time: int,
        vaccination_vector,
        vaccine_acceptance,
        protection_rate: float,
        poi_psi: float,
        home_beta: float,
        cbg_attack_rates_original,
        cbg_death_rates_original,
        poi_dwell_time_correction_factors=None,
        **kwargs,
    ) -> "EpidemicParams":
        """Derive rates exactly as the reference does
        (``disease_model.py:50-105``): POI factors ``ψ·d²/a``, vaccines
        clipped to ``population × acceptance``, post-vaccination attack rates
        ``α·((1−v/n) + (1−ρ)·v/n)`` clipped ≥0, death rates clipped to [0,1]
        (and — per the reference's 20211013 change — NOT reduced by
        vaccination)."""
        poi_areas = np.asarray(poi_areas, np.float32)
        cbg_sizes = np.asarray(cbg_sizes, np.float32)
        factors = poi_psi / poi_areas
        if poi_dwell_time_correction_factors is not None:
            factors = np.asarray(poi_dwell_time_correction_factors, np.float32) * factors

        v = np.clip(
            np.asarray(vaccination_vector, np.float32),
            None,
            cbg_sizes * np.asarray(vaccine_acceptance, np.float32),
        )
        frac = v / cbg_sizes
        attack_orig = np.asarray(cbg_attack_rates_original, np.float32)
        attack_vac = attack_orig * ((1 - frac) + (1 - protection_rate) * frac)
        attack_vac = np.clip(attack_vac, 0, None)
        death = np.clip(np.asarray(cbg_death_rates_original, np.float32), 0, 1)
        assert (death >= 0).all() and (death <= 1).all()

        return EpidemicParams(
            poi_factors=jnp.asarray(factors),
            cbg_sizes=jnp.asarray(cbg_sizes),
            attack_orig=jnp.asarray(attack_orig),
            attack_vac=jnp.asarray(attack_vac),
            death_orig=jnp.asarray(death),
            death_vac=jnp.asarray(death),
            home_beta=float(home_beta),
            p_sick_at_t0=float(p_sick_at_t0),
            vaccination_time=int(vaccination_time),
            total_hours=int(total_hours),
            psi=float(poi_psi),
            **kwargs,
        )


jax.tree_util.register_dataclass(
    EpidemicParams,
    data_fields=[
        "poi_factors", "cbg_sizes", "attack_orig", "attack_vac",
        "death_orig", "death_vac",
    ],
    meta_fields=[
        "home_beta", "p_sick_at_t0", "vaccination_time", "total_hours", "psi",
        "latency_period", "infectious_period", "confirmation_rate",
        "confirmation_lag", "death_lag", "clip_poisson_approximation", "approx_draws",
        "just_compute_r0",
    ],
)


def _binomial(key, n, p, approx=False):
    # n arrives as float state; the reference casts to int before drawing
    n = jnp.floor(n)
    p = jnp.clip(p, 0.0, 1.0)
    if approx:
        return _fast_count_draw(key, n * p, n * p * (1.0 - p), n)
    # distribution-exact, while_loop-free (sim/draws.py) — jax.random.binomial
    # lowers to per-element rejection loops that serialize on TPU (37x slower
    # than approx at production scale before this, DEMO.md r1)
    from pygcn_tpu.sim.draws import binomial_exact

    return binomial_exact(key, n, p)


def _poisson(key, lam, approx=False):
    if approx:
        return _fast_count_draw(key, lam, lam, jnp.inf)
    from pygcn_tpu.sim.draws import poisson_exact

    return poisson_exact(key, lam)


_SMALL_MEAN = 4.0
_KMAX = 12


def _fast_count_draw(key, mean, var, upper):
    """Cheap vectorized count sampler replacing rejection-sampled
    binomial/Poisson in ``approx_draws`` mode.

    Small means (≤ 4, where a clipped Gaussian is badly biased and the bias
    compounds through the epidemic's exponential growth) use truncated
    Poisson CDF inversion (k ≤ 12, residual tail < 1e-4); large means use a
    stochastically-rounded Gaussian. Both branches are pure VPU math — no
    rejection ``while_loop``.
    """
    kz, ku = jax.random.split(key)
    u = jax.random.uniform(ku, jnp.shape(mean))

    # branch A: truncated Poisson CDF inversion
    lam = jnp.clip(mean, 0.0, _SMALL_MEAN)
    pk = jnp.exp(-lam)
    cdf = pk
    count = jnp.zeros_like(mean)
    for k in range(1, _KMAX + 1):
        count = count + (u > cdf)
        pk = pk * lam / k
        cdf = cdf + pk
    small = count

    # branch B: Gaussian with stochastic rounding (mean-exact up to clipping)
    z = jax.random.normal(kz, jnp.shape(mean))
    y = jnp.floor(mean + jnp.sqrt(jnp.clip(var, 0.0, None)) * z + u)
    large = jnp.clip(y, 0.0, upper)

    return jnp.where(mean <= _SMALL_MEAN, jnp.minimum(small, upper), large)


def _segment_matmul(values, idx_gather, idx_segment, w_e, num_segments: int):
    """Weighted gather+segment over the LAST axis of ``values``:

    ``out[..., s] = Σ_{e: idx_segment[e]==s} w_e[e] · values[..., idx_gather[e]]``

    i.e. the hourly sparse visit-matrix product, computed node-major so the
    seed/batch axis rides as contiguous wide rows through one gather and one
    segment scatter (the seed-major [S, E] form makes every access strided —
    measured ~an order of magnitude slower at production scale).
    """
    batch_shape = values.shape[:-1]
    x = jnp.moveaxis(values, -1, 0).reshape(values.shape[-1], -1)  # [N, B]
    # gather cost is per-row and flat up to 512 B/row with a cliff above
    # (PERF_NOTES.md) — chunk wide batch axes (e.g. vmapped policies x seeds)
    chunks = [
        jax.ops.segment_sum(
            jnp.take(x[:, i : i + 128], idx_gather, axis=0) * w_e[:, None],
            idx_segment, num_segments=num_segments,
        )
        for i in range(0, x.shape[1], 128)
    ]
    seg = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=1)
    return jnp.moveaxis(seg.reshape((num_segments,) + batch_shape), 0, -1)


def compute_hour_rates(state, t, params: EpidemicParams, visits: VisitSeq):
    """Deterministic per-hour infection quantities (reference
    ``get_new_cases`` math, ``disease_model.py:260-345``), exposed separately
    so the formulas can be golden-tested against direct NumPy:

    - ``base_rates``: home infection rates ``β·α(t)·I/n`` (clipped to 1);
    - ``poi_rates``: per-POI rates ``ψd²/a · Σ_c V[p,c]·I_c/n_c`` (clipped);
    - ``mean_from_poi``: per-CBG expected POI-sourced cases
      ``α(t)·s/n · Σ_p V[p,c]·poi_rates[p]``;
    plus num_sus, attack/death rate vectors and the clip counters.

    State arrays may carry leading batch axes (``[..., N]``, e.g. the
    Monte-Carlo seed axis); clip counters count over ALL axes.
    """
    sizes = params.cbg_sizes
    latent, infected, removed = state["latent"], state["infected"], state["removed"]

    densities = infected / sizes
    num_sus = jnp.clip(sizes - latent - infected - removed, 0.0, None)
    sus_frac = num_sus / sizes
    after_vac = t >= params.vaccination_time
    attack = jnp.where(after_vac, params.attack_vac, params.attack_orig)
    death_rate = jnp.where(after_vac, params.death_vac, params.death_orig)
    n_batch = int(np.prod(densities.shape[:-1], dtype=np.int64))

    if params.psi > 0:
        base_rates = params.home_beta * attack * densities
    else:
        overall = infected.sum(-1, keepdims=True) / sizes.sum()
        base_rates = jnp.broadcast_to(overall * params.home_beta, densities.shape)
    base_rates = jnp.nan_to_num(base_rates)
    n_base_clipped = (base_rates > 1.0).sum()
    base_rates = jnp.clip(base_rates, None, 1.0)

    tp = t % visits.period
    poi_e = visits.poi_idx[tp]
    cbg_e = visits.cbg_idx[tp]
    w_e = visits.w[tp]

    poi_visits = jax.ops.segment_sum(w_e, poi_e, num_segments=visits.n_pois)
    # state-independent: count once per batch element to match the summed
    # per-seed counters of the vmapped formulation
    n_active_pois = (poi_visits > 0).sum() * max(n_batch, 1)
    poi_rates = params.poi_factors * _segment_matmul(
        densities, cbg_e, poi_e, w_e, visits.n_pois
    )
    n_poi_clipped = (poi_rates > 1.0).sum()
    if params.clip_poisson_approximation:
        poi_rates = jnp.clip(poi_rates, None, 1.0)

    mean_from_poi = attack * sus_frac * _segment_matmul(
        poi_rates, poi_e, cbg_e, w_e, visits.n_cbgs
    )
    mean_from_poi = jnp.nan_to_num(mean_from_poi)
    return {
        "base_rates": base_rates,
        "poi_rates": poi_rates,
        "mean_from_poi": mean_from_poi,
        "num_sus": num_sus,
        "attack": attack,
        "death_rate": death_rate,
        "n_base_clipped": n_base_clipped,
        "n_active_pois": n_active_pois,
        "n_poi_clipped": n_poi_clipped,
    }


def _hour_update(state, key, t, params: EpidemicParams, visits: VisitSeq):
    """One hour for ALL seeds at once. ``state``: dict of [S, N] float arrays
    (any leading batch shape works). All stochastic draws are single [S, N]
    shaped calls; the two sparse visit products run node-major with the seed
    axis as contiguous wide rows (see ``_segment_matmul``) — replacing the
    per-seed ``vmap`` whose strided access dominated at production scale.
    Returns ``(new_state, monitor[5])`` with counters summed over seeds."""
    n_keys = jax.random.split(key, 7)

    # --- get_new_cases (disease_model.py:260-345) ---
    rates = compute_hour_rates(state, t, params, visits)
    base_rates = rates["base_rates"]
    mean_from_poi = rates["mean_from_poi"]
    num_sus = rates["num_sus"]
    death_rate = rates["death_rate"]
    latent, infected, removed = state["latent"], state["infected"], state["removed"]
    n_base_clipped = rates["n_base_clipped"]
    n_active_pois = rates["n_active_pois"]
    n_poi_clipped = rates["n_poi_clipped"]
    cases_poi_raw = _poisson(n_keys[0], mean_from_poi, params.approx_draws)
    n_cbgs_active = (mean_from_poi > 0).sum()
    n_cbgs_clipped = (cases_poi_raw > num_sus).sum()
    cases_poi = jnp.clip(cases_poi_raw, None, num_sus)
    cases_base = _binomial(n_keys[1], num_sus - cases_poi, base_rates, params.approx_draws)
    new_cases = cases_poi + cases_base

    # --- update_states (disease_model.py:224-258) ---
    new_infectious = _binomial(n_keys[2], latent, 1.0 / params.latency_period, params.approx_draws)
    new_removed = _binomial(n_keys[3], infected, 1.0 / params.infectious_period, params.approx_draws)

    if params.just_compute_r0:
        # R0-calibration gate (disease_model.py:254-258): new cases never
        # enter latent — they are parked in removed, so only the initial
        # seeds spread and total_affected - seeds estimates R0. Confirmation
        # and death pipelines are suppressed entirely (the reference skips
        # those draws in this branch).
        latent = latent - new_infectious
        infected = infected + new_infectious - new_removed
        removed = removed + new_removed + new_cases
        new_state = {
            "latent": latent,
            "infected": infected,
            "removed": removed,
            "cases_to_confirm": state["cases_to_confirm"],
            "deaths_to_happen": state["deaths_to_happen"],
            "C2": state["C2"],
            "D2": state["D2"],
        }
        monitor = jnp.stack(
            [n_base_clipped, n_active_pois, n_poi_clipped, n_cbgs_active, n_cbgs_clipped]
        )
        return new_state, monitor

    latent = latent + new_cases - new_infectious
    infected = infected + new_infectious - new_removed
    removed = removed + new_removed

    new_confirmed = _binomial(n_keys[4], state["cases_to_confirm"], 1.0 / params.confirmation_lag, params.approx_draws)
    add_to_confirm = _binomial(n_keys[5], new_infectious, params.confirmation_rate, params.approx_draws)
    cases_to_confirm = state["cases_to_confirm"] + add_to_confirm - new_confirmed

    new_deaths = _binomial(n_keys[6], state["deaths_to_happen"], 1.0 / params.death_lag, params.approx_draws)
    key_d = jax.random.fold_in(n_keys[6], 1)
    add_deaths = _binomial(key_d, new_infectious, death_rate, params.approx_draws)
    deaths_to_happen = state["deaths_to_happen"] + add_deaths - new_deaths

    new_state = {
        "latent": latent,
        "infected": infected,
        "removed": removed,
        "cases_to_confirm": cases_to_confirm,
        "deaths_to_happen": deaths_to_happen,
        "C2": state["C2"] + new_confirmed,
        "D2": state["D2"] + new_deaths,
    }
    monitor = jnp.stack(
        [n_base_clipped, n_active_pois, n_poi_clipped, n_cbgs_active, n_cbgs_clipped]
    )
    return new_state, monitor


def init_state(key, params: EpidemicParams, num_seeds: int):
    """Binomial latent seeding (reference ``init_endogenous_variables``,
    ``disease_model.py:113-127``)."""
    n = params.cbg_sizes.shape[0]
    p0 = jax.random.binomial(
        key, params.cbg_sizes, params.p_sick_at_t0, shape=(num_seeds, n)
    ).astype(jnp.float32)
    zeros = jnp.zeros((num_seeds, n), jnp.float32)
    return {
        "latent": p0,
        "infected": zeros,
        "removed": zeros,
        "cases_to_confirm": zeros,
        "deaths_to_happen": zeros,
        "C2": zeros,
        "D2": zeros,
    }


def _run_blocks(state, keys, over, t0, params: EpidemicParams, visits: VisitSeq,
                verbosity: int, blocks: int):
    """Scan ``blocks`` recording blocks starting at absolute hour ``t0``.

    Shared by :func:`simulate` (one call over the whole horizon) and
    :func:`simulate_paged` (one call per streamed visit page). ``t0`` must be
    a multiple of ``visits.period`` so ``t % period`` hits the right row.
    """

    def block_step(carry, block_idx):
        state, keys, over = carry
        # record at block start (reference records at loop top, t % 24 == 0)
        rec = {
            "L": state["latent"].sum(-1),
            "I": state["infected"].sum(-1),
            "R": state["removed"].sum(-1),
            "history_C2": state["C2"],
            "history_D2": state["D2"],
        }

        def hour_step(c, h):
            state, keys, over = c
            t = t0 + block_idx * verbosity + h
            k_t = jax.random.fold_in(keys, t)
            new_state, monitor = _hour_update(state, k_t, t, params, visits)
            # freeze everything once the epidemic has died globally
            # (reference disease_model.py:200-206)
            new_state = jax.tree.map(
                lambda new, old: jnp.where(over, old, new), new_state, state
            )
            over = over | (
                jnp.max(new_state["latent"] + new_state["infected"]) < 1.0
            )
            return (new_state, keys, over), jnp.where(over, 0, monitor)

        (state, keys, over), monitors = jax.lax.scan(
            hour_step, (state, keys, over), jnp.arange(verbosity)
        )
        return (state, keys, over), (rec, monitors)

    (state, keys, over), (recs, monitors) = jax.lax.scan(
        block_step, (state, keys, over), jnp.arange(blocks)
    )
    return state, keys, over, recs, monitors


def _finalize(state, recs, monitors, blocks):
    all_affected = state["latent"] + state["infected"] + state["removed"]
    return {
        "L": recs["L"],
        "I": recs["I"],
        "R": recs["R"],
        "history_C2": recs["history_C2"],
        "history_D2": recs["history_D2"],
        "C2": state["C2"],
        "D2": state["D2"],
        "total_affected": all_affected.sum(-1),
        "cbg_all_affected": all_affected,
        "monitor": monitors.reshape(-1, 5),
    }


def simulate(
    params: EpidemicParams,
    visits: VisitSeq,
    num_seeds: int,
    key: jax.Array,
    verbosity: int = 24,
):
    """Run the full horizon; returns the reference's outputs as a dict:

    ``times`` [D], ``L``/``I``/``R`` [D, S] (block-start sums),
    ``history_C2``/``history_D2`` [D, S, N] (block-start cumulative),
    ``C2``/``D2`` [S, N] (final), ``total_affected`` [S],
    ``cbg_all_affected`` [S, N], ``monitor`` [T, 5] seed-summed clip counters.
    (Reference returns tuple at ``disease_model.py:222``.)
    """
    t_total = params.total_hours
    if t_total % verbosity:
        raise ValueError("total_hours must be a multiple of verbosity")
    blocks = t_total // verbosity

    k_init, k_run = jax.random.split(key)
    state = init_state(k_init, params, num_seeds)

    state, _, _, recs, monitors = _run_blocks(
        state, k_run, jnp.asarray(False), 0, params, visits, verbosity, blocks,
    )
    out = _finalize(state, recs, monitors, blocks)
    out["times"] = jnp.arange(blocks) * verbosity
    return out


@dataclasses.dataclass(frozen=True)
class HostVisitSeq:
    """Host-resident (NumPy) padded COO visit sequence for horizons whose
    full ``[T, E_max]`` buffers exceed device memory (production SafeGraph:
    ~50K POIs x 1512 non-periodic hours). Pages of hours are streamed to the
    device by :func:`simulate_paged`."""

    poi_idx: np.ndarray  # [T, E_max] int32
    cbg_idx: np.ndarray
    w: np.ndarray  # [T, E_max] float32
    n_pois: int
    n_cbgs: int

    @staticmethod
    def from_dense(mats: np.ndarray) -> "HostVisitSeq":
        poi, cbg, w, m, n = _pack_dense(np.asarray(mats))
        return HostVisitSeq(poi, cbg, w, m, n)

    @staticmethod
    def from_scipy(mats) -> "HostVisitSeq":
        poi, cbg, w, m, n = _pack_scipy(mats)
        return HostVisitSeq(poi, cbg, w, m, n)

    def to_device(self) -> VisitSeq:
        """Whole-horizon device VisitSeq (when it fits HBM)."""
        return VisitSeq(
            poi_idx=jnp.asarray(self.poi_idx), cbg_idx=jnp.asarray(self.cbg_idx),
            w=jnp.asarray(self.w), n_pois=self.n_pois, n_cbgs=self.n_cbgs,
            period=self.poi_idx.shape[0],
        )

    def page(self, t0: int, hours: int) -> VisitSeq:
        """Device VisitSeq for absolute hours [t0, t0+hours) with
        period=hours, so the absolute-time lookup ``t % period`` lands on the
        local row when ``t0`` is a multiple of ``hours``. Hours past the
        stored horizon wrap around (periodic reuse, e.g. one stored week
        cycling over a longer simulation)."""
        rows = np.arange(t0, t0 + hours) % self.poi_idx.shape[0]
        # jax.device_put is asynchronous: simulate_paged issues page k+1's
        # transfer before awaiting page k's scan, so the copy rides under
        # compute on hardware with real DMA bandwidth
        return VisitSeq(
            poi_idx=jax.device_put(self.poi_idx[rows]),
            cbg_idx=jax.device_put(self.cbg_idx[rows]),
            w=jax.device_put(self.w[rows]),
            n_pois=self.n_pois, n_cbgs=self.n_cbgs, period=hours,
        )


def simulate_paged(
    params: EpidemicParams,
    visits: HostVisitSeq,
    num_seeds: int,
    key: jax.Array,
    verbosity: int = 24,
    page_hours: int = 168,
):
    """:func:`simulate` with host→device streaming of the visit sequence.

    The horizon is cut into ``page_hours`` pages; page ``k+1``'s transfer is
    issued (async ``device_put``) before page ``k``'s jitted scan is awaited,
    so the copy rides under compute (double buffering). Bit-identical to
    ``simulate`` on the same key: absolute hours drive both the PRNG fold-in
    and the vaccination-time switch.
    """
    t_total = params.total_hours
    if t_total % verbosity:
        raise ValueError("total_hours must be a multiple of verbosity")
    page_hours = min(page_hours, t_total)
    if page_hours % verbosity or t_total % page_hours:
        raise ValueError(
            "page_hours must be a multiple of verbosity and divide total_hours"
        )
    blocks_per_page = page_hours // verbosity
    n_pages = t_total // page_hours

    k_init, k_run = jax.random.split(key)
    state = init_state(k_init, params, num_seeds)
    keys = k_run
    over = jnp.asarray(False)

    run = jax.jit(
        functools.partial(
            _run_blocks, verbosity=verbosity, blocks=blocks_per_page,
        )
    )

    recs_pages, mon_pages = [], []
    next_page = visits.page(0, page_hours)
    for p in range(n_pages):
        cur = next_page
        if p + 1 < n_pages:  # issue next transfer before awaiting this page
            next_page = visits.page((p + 1) * page_hours, page_hours)
        state, keys, over, recs, monitors = run(
            state, keys, over, p * page_hours, params, cur
        )
        recs_pages.append(recs)
        mon_pages.append(monitors)

    recs = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *recs_pages)
    monitors = jnp.concatenate(mon_pages, axis=0)
    blocks = t_total // verbosity
    out = _finalize(state, recs, monitors, blocks)
    out["times"] = jnp.arange(blocks) * verbosity
    return out
