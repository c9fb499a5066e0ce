"""Shared pieces for the CLI apps: synthetic worlds and simulator glue.

The reference scripts all load a SafeGraph MSA (mobility pickles + census
CSVs) that is not distributable; every app here therefore accepts
``--synthetic`` and builds a structurally identical world — POI×CBG visit
matrices, co-visitation adjacency, demographics, calibrated epidemic
parameters — so the complete pipelines run end-to-end anywhere.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import scipy.sparse as sp

from pygcn_tpu.graph.covisit import average_visits, covisitation_adj
from pygcn_tpu.graph.graph import Graph
from pygcn_tpu.graph.transform import sym_normalize
from pygcn_tpu.sim import EpidemicParams, VisitSeq, calibration
from pygcn_tpu.sim.model import HostVisitSeq, simulate, simulate_paged


def _spectral_norm(a: np.ndarray, iters: int = 30, seed: int = 0) -> float:
    """Top singular value via power iteration (symmetric a)."""
    v = np.random.default_rng(seed).normal(size=a.shape[0])
    for _ in range(iters):
        v = a @ v
        v /= np.linalg.norm(v) + 1e-30
    return float(v @ (a @ v))


@dataclasses.dataclass
class World:
    """A synthetic MSA-shaped workload."""

    n_cbgs: int
    n_pois: int
    sizes: np.ndarray  # [N] populations
    demographics: np.ndarray  # [N, 4] sizes/elder/income/ew (raw)
    embeddings: np.ndarray  # [N, E]
    visits: VisitSeq
    visits_host: HostVisitSeq  # host copy; enables paged streaming at scale
    adj: np.ndarray  # dense co-visitation adjacency
    graph: Graph
    params: EpidemicParams
    vaccine_acceptance: np.ndarray


def build_synthetic_world(
    n_cbgs: int = 64,
    n_pois: int = 20,
    hours: int = 168,
    total_hours: Optional[int] = None,
    n_embed: int = 8,
    msa_name: str = "SanFrancisco",
    vaccination_time: int = 24,
    vaccination_vector: Optional[np.ndarray] = None,
    protection_rate: float = 1.0,
    seed: int = 0,
) -> World:
    rng = np.random.default_rng(seed)
    rec = calibration.MSA_TABLE[msa_name]

    sizes = rng.integers(500, 3000, n_cbgs).astype(np.float32)
    elder = rng.uniform(0.05, 0.3, n_cbgs)
    income = rng.uniform(3e4, 1.2e5, n_cbgs)
    ew = rng.uniform(0.1, 0.5, n_cbgs)
    demographics = np.stack([sizes, elder, income, ew], axis=1).astype(np.float32)
    embeddings = rng.normal(size=(n_cbgs, n_embed)).astype(np.float32)

    # Structured mobility: each CBG visits a small "home set" of POIs chosen
    # with Zipf-like POI popularity. I.i.d.-uniform visits make the
    # co-visitation matrix near rank-1 at scale (every pair co-visits
    # everything), which oversmooths any GCN; home-set structure gives the
    # graph real communities, like actual SafeGraph mobility.
    n_home = min(6, n_pois)
    poi_pop = (1.0 - rng.uniform(size=n_pois)) ** (-1.0 / 1.5)
    poi_pop /= poi_pop.sum()
    home_pois = np.stack(
        [rng.choice(n_pois, n_home, replace=False, p=poi_pop) for _ in range(n_cbgs)]
    )
    visits_dense = np.zeros((hours, n_pois, n_cbgs), np.float32)
    rate = sizes / sizes.mean()
    for c in range(n_cbgs):
        v = rng.uniform(0, 3.0, (hours, n_home)) * rate[c]
        v[v < 1.2 * rate[c]] = 0.0
        visits_dense[:, home_pois[c], c] = v
    visits_host = HostVisitSeq.from_dense(visits_dense)
    visits = visits_host.to_device()

    avg = average_visits(list(visits_dense))
    adj = covisitation_adj(avg)
    # The reference feeds the RAW co-visitation matrix to its GCN — no
    # normalization in the safegraph path (reference pygcn/utils.py:93-132) —
    # which works there because its targets are raw case counts at a matching
    # scale. Per-row (sym) normalization is wrong for dense co-visitation
    # graphs: it oversmooths every node to the same embedding in one hop.
    # The structure-preserving middle ground is a SCALAR spectral
    # normalization: divide by the top singular value so GCN activations stay
    # O(1) against standardized targets while the VᵀV diagonal keeps node
    # identity.
    adj_scaled = adj / max(_spectral_norm(adj), 1e-12)
    graph = Graph.from_scipy(sp.csr_matrix(adj_scaled), is_symmetric=True, build_dense=True)

    total = total_hours or 2 * hours  # periodic visit reuse past one cycle
    if vaccination_vector is None:
        vaccination_vector = np.zeros(n_cbgs)
    acceptance = np.ones(n_cbgs, np.float32)
    params = EpidemicParams.build(
        poi_areas=rng.uniform(100, 1000, n_pois),
        cbg_sizes=sizes,
        total_hours=total,
        # boosted vs the calibrated MSA values so the toy-scale world shows
        # visible dynamics within a short horizon
        p_sick_at_t0=max(rec.p_sick_at_t0, 1e-2),
        vaccination_time=vaccination_time,
        vaccination_vector=vaccination_vector,
        vaccine_acceptance=acceptance,
        protection_rate=protection_rate,
        poi_psi=rec.poi_psi,
        home_beta=max(rec.home_beta, 0.02),
        cbg_attack_rates_original=np.ones(n_cbgs),
        cbg_death_rates_original=np.full(n_cbgs, 0.01 * rec.death_scale),
        confirmation_lag=48.0,
        death_lag=96.0,
    )
    return World(
        n_cbgs=n_cbgs, n_pois=n_pois, sizes=sizes, demographics=demographics,
        embeddings=embeddings, visits=visits, visits_host=visits_host, adj=adj,
        graph=graph, params=params, vaccine_acceptance=acceptance,
    )


def run_policy_simulation(
    world: World,
    vaccination_vector: np.ndarray,
    num_seeds: int,
    key,
    vaccination_time: Optional[int] = None,
    page_hours: Optional[int] = None,
):
    """One simulator run for a concrete vaccination vector (the apps' analog
    of the reference's ``run_simulation`` glue, ``policy-generator.py:177-208``).

    ``page_hours`` switches to host->device streamed visits
    (:func:`pygcn_tpu.sim.simulate_paged`) for horizons whose visit buffers
    exceed device memory; results are bit-identical."""
    import jax
    import jax.numpy as jnp

    p = world.params
    fields = {f: getattr(p, f) for f in p.__dataclass_fields__}
    frac = np.clip(np.asarray(vaccination_vector), None,
                   np.asarray(p.cbg_sizes) * world.vaccine_acceptance) / np.asarray(p.cbg_sizes)
    attack_orig = np.asarray(p.attack_orig)
    fields["attack_vac"] = jnp.asarray(np.clip(attack_orig * (1 - frac), 0, None))
    if vaccination_time is not None:
        fields["vaccination_time"] = vaccination_time
    params = EpidemicParams(**fields)
    if page_hours:
        return simulate_paged(
            params, world.visits_host, num_seeds, key, page_hours=page_hours
        )
    return simulate(params, world.visits, num_seeds, key)


def policy_outcomes(out, sizes: np.ndarray):
    """(total_cases, case_rate_std, total_deaths, death_rate_std) from a
    simulate() output, averaged over seeds — the gt-generator's label row
    (reference ``gt-gen-vac-fixed-num-cbgs.py:425-450``)."""
    cases_cbg = np.asarray(out["history_C2"])[-1].mean(axis=0)
    deaths_cbg = np.asarray(out["history_D2"])[-1].mean(axis=0)
    case_rates = cases_cbg / sizes
    death_rates = deaths_cbg / sizes
    return (
        float(cases_cbg.sum()),
        float(case_rates.std()),
        float(deaths_cbg.sum()),
        float(death_rates.std()),
    )


def set_process_title(app_name: str) -> None:
    """Ops-visibility process title (the reference sets one in every script,
    e.g. ``pygcn/train.py:4-5``); gated — setproctitle is optional."""
    try:
        import setproctitle

        setproctitle.setproctitle(f"pygcn-tpu@{app_name}")
    except ImportError:
        pass
