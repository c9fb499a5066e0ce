import jax
import jax.numpy as jnp
import numpy as np

from pygcn_tpu.sim import EpidemicParams, VisitSeq, simulate
from pygcn_tpu.sim.policies import (
    apply_smoothing,
    assign_group,
    assign_groups,
    average_across_random_seeds,
    fips_code,
    get_separators,
    gini,
    match_msa_name_to_acs,
    vaccine_distribution_fixed_nn,
    vaccine_distribution_flood,
    vaccine_distribution_flood_new,
)


def tiny_world(n_cbgs=20, n_pois=6, hours=48, seed=0, vac_vector=None, protection=0.5):
    rng = np.random.default_rng(seed)
    sizes = rng.integers(500, 2000, n_cbgs).astype(np.float32)
    visits = rng.uniform(0, 3.0, (hours, n_pois, n_cbgs)).astype(np.float32)
    visits[visits < 2.0] = 0.0  # sparsify
    if vac_vector is None:
        vac_vector = np.zeros(n_cbgs)
    params = EpidemicParams.build(
        poi_areas=rng.uniform(100, 1000, n_pois),
        cbg_sizes=sizes,
        total_hours=hours,
        p_sick_at_t0=0.01,
        vaccination_time=24,
        vaccination_vector=vac_vector,
        vaccine_acceptance=np.ones(n_cbgs),
        protection_rate=protection,
        poi_psi=1500.0,
        home_beta=0.005,
        cbg_attack_rates_original=np.ones(n_cbgs),
        cbg_death_rates_original=np.full(n_cbgs, 0.01),
    )
    return params, VisitSeq.from_dense(visits), sizes


def test_simulation_shapes_and_invariants():
    params, visits, sizes = tiny_world()
    out = simulate(params, visits, num_seeds=4, key=jax.random.key(0))

    d = 48 // 24
    assert out["history_C2"].shape == (d, 4, 20)
    assert out["L"].shape == (d, 4)
    assert out["total_affected"].shape == (4,)
    assert out["monitor"].shape == (48, 5)

    # cumulative histories are monotone
    h = np.asarray(out["history_C2"])
    assert (np.diff(h, axis=0) >= -1e-6).all()
    # nobody infected beyond the population
    affected = np.asarray(out["cbg_all_affected"])
    assert (affected <= sizes[None, :] + 1e-5).all()
    assert (affected >= 0).all()
    # states stay finite
    assert np.isfinite(np.asarray(out["C2"])).all()


def test_simulation_deterministic_given_key():
    params, visits, _ = tiny_world()
    o1 = simulate(params, visits, num_seeds=2, key=jax.random.key(7))
    o2 = simulate(params, visits, num_seeds=2, key=jax.random.key(7))
    np.testing.assert_array_equal(
        np.asarray(o1["total_affected"]), np.asarray(o2["total_affected"])
    )
    o3 = simulate(params, visits, num_seeds=2, key=jax.random.key(8))
    assert not np.array_equal(
        np.asarray(o1["total_affected"]), np.asarray(o3["total_affected"])
    )


def test_vaccination_reduces_cases():
    """Full coverage with protection 1.0 after t=0 → attack rates 0 →
    only the POI-free baseline; compare total affected vs no vaccination."""
    n = 20
    _, visits, sizes = tiny_world()
    no_vac, _, _ = tiny_world(vac_vector=np.zeros(n))
    full_vac, _, _ = tiny_world(vac_vector=sizes.copy(), protection=1.0)
    # vaccinate from the start
    full_vac = EpidemicParams(
        **{**{f.name: getattr(full_vac, f.name) for f in full_vac.__dataclass_fields__.values()},
           "vaccination_time": 0}
    )
    out_no = simulate(no_vac, visits, num_seeds=8, key=jax.random.key(1))
    out_full = simulate(full_vac, visits, num_seeds=8, key=jax.random.key(1))
    # with attack rates zeroed, no new cases at all beyond initial seeding
    assert float(np.mean(np.asarray(out_full["total_affected"]))) < float(
        np.mean(np.asarray(out_no["total_affected"]))
    )


def test_epidemic_freeze_on_die_out():
    """With zero transmission the epidemic dies; states freeze (including
    pending confirmations, matching the reference's early exit)."""
    params, visits, _ = tiny_world()
    dead = EpidemicParams(
        **{**{f.name: getattr(params, f.name) for f in params.__dataclass_fields__.values()},
           "home_beta": 0.0, "psi": 0.0, "p_sick_at_t0": 0.001}
    )
    # psi=0 triggers the uniform-mixing ablation with home_beta=0 → no spread
    out = simulate(dead, visits, num_seeds=2, key=jax.random.key(2))
    total = np.asarray(out["total_affected"])
    assert np.isfinite(total).all()


def test_expected_transition_rates():
    """E[new_infectious] ≈ latent/latency over many seeds."""
    params, visits, _ = tiny_world(hours=24)
    out = simulate(params, visits, num_seeds=64, key=jax.random.key(3))
    # just verify the simulation produces growing case counts with plausible
    # magnitude (smoke-level statistical check)
    assert float(np.asarray(out["total_affected"]).mean()) > 0


# ---------------------------------------------------------------------- #
# policies
# ---------------------------------------------------------------------- #


def test_flood_distribution_budget_and_order():
    rng = np.random.default_rng(0)
    sizes = rng.integers(100, 1000, 30).astype(float)
    feat = rng.normal(size=30)
    ratio = 0.4
    vac = vaccine_distribution_flood(sizes, ratio, feat, ascending=True, execution_ratio=0.6)
    # total distributed equals the full budget (policy + random leftover)
    np.testing.assert_allclose(vac.sum(), sizes.sum() * ratio, rtol=1e-9)
    # nobody exceeds population
    assert (vac <= sizes + 1e-9).all()
    # the lowest-feature CBGs are fully covered under the policy budget
    order = np.argsort(feat)
    policy_budget = sizes.sum() * ratio * 0.6
    cum = np.cumsum(sizes[order])
    fully = order[: int(np.searchsorted(cum, policy_budget))]
    np.testing.assert_allclose(vac[fully[:-1]], sizes[fully[:-1]])


def test_flood_new_priority():
    sizes = np.full(10, 100.0)
    feat = np.arange(10.0)
    vulnerable = np.zeros(10)
    vulnerable[7] = 1  # must be served first despite high feature value
    vac = vaccine_distribution_flood_new(
        sizes, 0.2, feat, ascending=True, execution_ratio=1.0,
        leftover=0.0, is_last=True,
        current_vector=np.zeros(10), most_vulnerable=vulnerable,
    )
    assert vac[7] == 100.0
    np.testing.assert_allclose(vac.sum(), sizes.sum() * 0.2)


def test_fixed_nn_distribution():
    sizes = np.array([100.0, 200.0, 300.0, 400.0])
    vac = vaccine_distribution_fixed_nn(sizes, 0.1, 2, proportional=False, target_idxs=[1, 3])
    np.testing.assert_allclose(vac, [0, 50, 0, 50])
    vac = vaccine_distribution_fixed_nn(sizes, 0.1, 2, proportional=True, target_idxs=[1, 3])
    np.testing.assert_allclose(vac, [0, 100 * 200 / 600, 0, 100 * 400 / 600])


def test_separators_and_group_assignment():
    rng = np.random.default_rng(1)
    sizes = rng.integers(50, 150, 100).astype(float)
    indicator = rng.uniform(0, 1, 100)
    seps = get_separators(sizes, indicator, 4, normalized=True)
    assert seps[0] == -0.1 and seps[-1] == 1
    groups = assign_groups(indicator, seps)
    # groups roughly population-balanced
    pops = np.array([sizes[groups == g].sum() for g in range(4)])
    assert pops.min() > 0.5 * pops.mean()
    # scalar and vector versions agree
    for i in range(0, 100, 13):
        assert assign_group(indicator[i], seps) == groups[i]
        assert assign_group(indicator[i], seps, reverse=True) == 3 - groups[i]


def test_gini_known_values():
    assert abs(gini(np.ones(100))) < 1e-4  # perfect equality
    unequal = np.zeros(100)
    unequal[-1] = 100.0
    assert gini(unequal) > 0.95


def test_smoothing_and_averaging():
    x = np.arange(10.0)
    sm = apply_smoothing(x, before=1, after=1)
    np.testing.assert_allclose(sm[1:-1], x[1:-1])
    hist = np.arange(2 * 3 * 4).reshape(2, 3, 4).astype(float)
    avg_c, avg_d, cases, deaths = average_across_random_seeds(hist, hist, [0, 2])
    np.testing.assert_allclose(avg_c, hist.mean(axis=1))
    np.testing.assert_allclose(cases, hist.mean(axis=1)[:, [0, 2]].sum(1))


def test_msa_matching_and_fips():
    assert fips_code(6, 75) == 6075
    msas = ["San Francisco-Oakland-Hayward, CA", "Chicago-Naperville-Elgin, IL-IN-WI"]
    assert match_msa_name_to_acs("Fresno_CA", msas) is None  # no shared city
    assert match_msa_name_to_acs("Oakland_CA", msas) == msas[0]
    assert match_msa_name_to_acs("Chicago_IL_IN_WI", msas) == msas[1]


def test_approx_draws_match_exact_statistics():
    """Moment-matched Gaussian draws track the exact distributions."""
    import dataclasses

    params, visits, _ = tiny_world(hours=48)
    exact = simulate(params, visits, num_seeds=48, key=jax.random.key(0))
    approx_params = dataclasses.replace(params, approx_draws=True)
    approx = simulate(approx_params, visits, num_seeds=48, key=jax.random.key(0))
    m_exact = float(np.asarray(exact["total_affected"]).mean())
    m_approx = float(np.asarray(approx["total_affected"]).mean())
    assert abs(m_exact - m_approx) / max(m_exact, 1.0) < 0.1, (m_exact, m_approx)
    # confirmations must still flow (stochastic rounding, not deterministic)
    assert float(np.asarray(approx["C2"]).sum()) > 0
    assert (np.asarray(approx["cbg_all_affected"]) >= 0).all()


def test_vulnerability_and_damage():
    from pygcn_tpu.sim.policies import vulnerability_and_damage

    sizes = np.array([100.0, 200.0])
    same = np.array([10.0, 5.0])
    diff = np.array([2.0, 1.0])
    death = np.array([0.01, 0.02])
    vul, dam = vulnerability_and_damage(same, diff, sizes, death, s_ratio=0.9, i_ratio=0.01)
    infect_norm = (same + diff) / sizes
    avg_death = (sizes * death).sum() / sizes.sum()
    np.testing.assert_allclose(vul, infect_norm * death)
    np.testing.assert_allclose(dam, vul + infect_norm**2 * 90.0 * avg_death)
    assert (dam >= vul).all()


def test_hour_rates_match_reference_formulas():
    """Golden test: the per-hour rate math equals direct NumPy evaluation of
    the reference formulas (disease_model.py:260-345)."""
    from pygcn_tpu.sim.model import compute_hour_rates

    rng = np.random.default_rng(7)
    n, m = 12, 5
    params, visits, sizes = tiny_world(n_cbgs=n, n_pois=m, hours=24, seed=7)
    state = {
        "latent": jnp.asarray(rng.uniform(0, 30, n).astype(np.float32)),
        "infected": jnp.asarray(rng.uniform(0, 50, n).astype(np.float32)),
        "removed": jnp.asarray(rng.uniform(0, 20, n).astype(np.float32)),
    }
    t = 30  # after vaccination_time=24 → post-vac rates

    out = compute_hour_rates(state, t, params, visits)

    # direct NumPy evaluation
    infected = np.asarray(state["infected"])
    latent = np.asarray(state["latent"])
    removed = np.asarray(state["removed"])
    dens = infected / sizes
    num_sus = np.clip(sizes - latent - infected - removed, 0, None)
    attack = np.asarray(params.attack_vac)
    base = np.clip(params.home_beta * attack * dens, None, 1.0)

    # rebuild the dense visit matrix for hour t
    tp = t % visits.period
    v = np.zeros((m, n), np.float32)
    poi_e = np.asarray(visits.poi_idx[tp])
    cbg_e = np.asarray(visits.cbg_idx[tp])
    w_e = np.asarray(visits.w[tp])
    np.add.at(v, (poi_e, cbg_e), w_e)

    poi_rates = np.clip(np.asarray(params.poi_factors) * (v @ dens), None, 1.0)
    mean_poi = attack * (num_sus / sizes) * (poi_rates @ v)

    np.testing.assert_allclose(np.asarray(out["base_rates"]), base, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["poi_rates"]), poi_rates, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["mean_from_poi"]), mean_poi, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["num_sus"]), num_sus, rtol=1e-6)

    # before vaccination time → original rates
    out_pre = compute_hour_rates(state, 3, params, visits)
    base_pre = np.clip(params.home_beta * np.asarray(params.attack_orig) * dens, None, 1.0)
    np.testing.assert_allclose(np.asarray(out_pre["base_rates"]), base_pre, rtol=1e-5, atol=1e-6)


def test_simulate_policy_batch_mesh_matches_vmap():
    """simulate_policy_batch: the mesh-sharded fan-out is bit-identical to the
    single-device vmap, including when the batch does not divide the mesh
    axis (the pad-and-trim path)."""
    import dataclasses

    import jax.numpy as jnp

    from pygcn_tpu.parallel import make_mesh
    from pygcn_tpu.sim import simulate_policy_batch

    params, visits, _ = tiny_world(hours=24)
    params = dataclasses.replace(params, approx_draws=True)
    mesh = make_mesh([8], ["data"])

    batch = 11  # deliberately not a multiple of 8: exercises padding
    attack_vacs = jnp.tile(params.attack_orig[None], (batch, 1)) * jnp.linspace(
        0.4, 1.0, batch
    )[:, None]
    keys = jax.random.split(jax.random.key(7), batch)

    ref = simulate_policy_batch(params, visits, attack_vacs, keys, 2)
    out = simulate_policy_batch(params, visits, attack_vacs, keys, 2, mesh=mesh)
    assert out["cases_cbg"].shape[0] == batch
    for k in ref:
        np.testing.assert_array_equal(np.asarray(ref[k]), np.asarray(out[k]))


def test_batch_simulation_sharded_over_devices():
    """The vmapped policy batch shards over the device mesh (the reference's
    multiprocessing fan-out as a mesh axis)."""
    import dataclasses

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pygcn_tpu.parallel import make_mesh

    params, visits, _ = tiny_world(hours=24)
    mesh = make_mesh([8], ["data"])

    def one(attack_vac, k):
        p = dataclasses.replace(params, attack_vac=attack_vac, approx_draws=True)
        out = simulate(p, visits, 2, k)
        return out["total_affected"].sum()

    batch = 16
    attack_vacs = jnp.tile(params.attack_orig[None], (batch, 1)) * jnp.linspace(
        0.5, 1.0, batch
    )[:, None]
    keys = jax.random.split(jax.random.key(0), batch)
    sharding = NamedSharding(mesh, P("data"))
    attack_vacs = jax.device_put(attack_vacs, sharding)
    keys = jax.device_put(keys, sharding)

    totals = jax.jit(jax.vmap(one))(attack_vacs, keys)
    assert totals.shape == (batch,)
    assert np.isfinite(np.asarray(totals)).all()
    # lower attack rates → fewer cases, monotone-ish across the sweep
    t = np.asarray(totals)
    assert t[:4].mean() < t[-4:].mean()


def test_simulate_paged_matches_simulate():
    """Paged host->device streaming is bit-identical to the one-shot scan."""
    from pygcn_tpu.sim.model import HostVisitSeq, simulate_paged

    rng = np.random.default_rng(3)
    visits_dense = rng.uniform(0, 3.0, (72, 6, 20)).astype(np.float32)
    visits_dense[visits_dense < 2.0] = 0.0
    params, _, _ = tiny_world(hours=72)
    key = jax.random.key(7)
    ref = simulate(params, VisitSeq.from_dense(visits_dense), 3, key)
    paged = simulate_paged(
        params, HostVisitSeq.from_dense(visits_dense), 3, key, page_hours=24
    )
    for k in ref:
        np.testing.assert_array_equal(
            np.asarray(ref[k]), np.asarray(paged[k]), err_msg=k
        )


def test_simulate_paged_rejects_bad_page():
    import pytest

    from pygcn_tpu.sim.model import HostVisitSeq, simulate_paged

    rng = np.random.default_rng(3)
    visits_dense = rng.uniform(0, 3.0, (48, 6, 20)).astype(np.float32)
    params, _, _ = tiny_world()
    with pytest.raises(ValueError):
        simulate_paged(
            params, HostVisitSeq.from_dense(visits_dense), 2, jax.random.key(0),
            page_hours=36,  # not a multiple of verbosity=24
        )


def test_simulate_paged_periodic_wrap():
    """Pages past the stored horizon wrap (periodic visit reuse)."""
    import dataclasses

    from pygcn_tpu.sim.model import HostVisitSeq, simulate_paged

    rng = np.random.default_rng(5)
    visits_dense = rng.uniform(0, 3.0, (48, 6, 20)).astype(np.float32)
    visits_dense[visits_dense < 2.0] = 0.0
    params, _, _ = tiny_world(hours=48)
    params = dataclasses.replace(params, total_hours=96)  # 2 cycles of 48
    key = jax.random.key(11)
    # reference: one-shot simulate with the visits explicitly tiled to 96h
    ref = simulate(params, VisitSeq.from_dense(np.tile(visits_dense, (2, 1, 1))), 2, key)
    paged = simulate_paged(
        params, HostVisitSeq.from_dense(visits_dense), 2, key, page_hours=24
    )
    for k in ref:
        np.testing.assert_array_equal(
            np.asarray(ref[k]), np.asarray(paged[k]), err_msg=k
        )


def test_just_compute_r0_mode():
    """R0-calibration mode (reference ``disease_model.py:234-258``): new
    cases are parked in ``removed`` and never become infectious, so latent
    is non-increasing after seeding, confirmation/death pipelines stay
    zero, and ``total_affected - seeds`` counts secondary infections."""
    import dataclasses as _dc

    params, visits, sizes = tiny_world(hours=48)
    r0_params = _dc.replace(params, just_compute_r0=True)

    out = simulate(r0_params, visits, num_seeds=6, key=jax.random.key(3))

    # no confirmations or deaths are ever booked in r0 mode
    assert float(np.abs(np.asarray(out["C2"])).max()) == 0.0
    assert float(np.abs(np.asarray(out["D2"])).max()) == 0.0
    assert float(np.abs(np.asarray(out["history_C2"])).max()) == 0.0

    # latent only drains (new cases bypass it): block-start L sums are
    # non-increasing over time for every seed
    L = np.asarray(out["L"])  # [D, S]
    assert (np.diff(L, axis=0) <= 1e-5).all()

    # total_affected >= the initial seed count and well-defined
    assert (np.asarray(out["total_affected"]) >= L[0] - 1e-5).all()
    assert np.isfinite(np.asarray(out["total_affected"])).all()

    # normal mode on the same key books confirmations (sanity contrast:
    # the flag actually changes behavior)
    out_n = simulate(params, visits, num_seeds=6, key=jax.random.key(3))
    assert float(np.asarray(out_n["C2"]).sum()) > 0.0
