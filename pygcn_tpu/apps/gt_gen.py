"""Ground-truth generation driver.

TPU-native rebuild of the reference's ``gt-generator/gt-gen-vac-fixed-num-cbgs*``
family (G5/G6/G7): build a demographic table, form hybrid quantile groups,
sample fixed-NN vaccination policies (within-group or globally random, with
optional safe-distance rejection sampling), score each policy with the
epidemic simulator, and append rows
``[Vaccinated_Idxs, Total_Cases, Case_Rates_STD, Total_Deaths,
Death_Rates_STD]`` to a CSV with incremental flushing (crash-safe partial
results, reference ``gt-gen-vac-fixed-num-cbgs.py:443-450``).

The reference runs policies one-by-one on CPU NumPy; here policies are
*vmapped over the simulator* in device batches — the multiprocessing pool
becomes a batch axis.

Usage::

    python -m pygcn_tpu.apps.gt_gen --synthetic --num_samples 32 --NN 5 \
        --out /tmp/vac_results.csv
"""

from __future__ import annotations

import argparse
import csv
import dataclasses
import os

import numpy as np

from pygcn_tpu.apps.common import World, build_synthetic_world, policy_outcomes
from pygcn_tpu.sim.dist import simulate_policy_batch
from pygcn_tpu.sim.policies import (
    assign_groups,
    get_separators,
    vaccine_distribution_fixed_nn,
)


def batch_policy_outcomes(world: World, vac_vectors: np.ndarray, num_seeds: int, key,
                          approx: bool = False, mesh=None):
    """Simulate a batch of vaccination vectors by vmapping over the
    per-policy post-vaccination attack rates; with ``mesh``, the batch is
    sharded over the mesh's data axis (one simulator fan-out per chip —
    the reference's multiprocessing pool as a mesh axis,
    ``rl-policy-generator.py:308-321``)."""
    import jax
    import jax.numpy as jnp

    p = dataclasses.replace(world.params, approx_draws=approx)
    sizes = np.asarray(p.cbg_sizes)
    frac = np.clip(vac_vectors, None, sizes * world.vaccine_acceptance) / sizes
    attack_vacs = jnp.asarray(
        np.clip(np.asarray(p.attack_orig) * (1 - frac), 0, None), jnp.float32
    )

    keys = jax.random.split(key, vac_vectors.shape[0])
    out = simulate_policy_batch(
        p, world.visits, attack_vacs, keys, num_seeds, mesh=mesh
    )
    hist_c, hist_d = out["cases_cbg"], out["deaths_cbg"]

    rows = []
    for i in range(vac_vectors.shape[0]):
        cases_cbg = np.asarray(hist_c[i]).mean(axis=0)
        deaths_cbg = np.asarray(hist_d[i]).mean(axis=0)
        rows.append(
            (
                float(cases_cbg.sum()),
                float((cases_cbg / world.sizes).std()),
                float(deaths_cbg.sum()),
                float((deaths_cbg / world.sizes).std()),
            )
        )
    return rows


def hybrid_groups(world: World, num_groups: int = 3) -> np.ndarray:
    """3-feature quantile grouping → hybrid group ids
    (reference ``gt-gen-vac-fixed-num-cbgs.py:283-330``)."""
    ids = np.zeros(world.n_cbgs, np.int64)
    for col in (1, 2, 3):  # elder, income, ew
        feat = world.demographics[:, col]
        seps = get_separators(world.sizes, feat, num_groups, normalized=False)
        ids = ids * num_groups + assign_groups(feat, seps)
    return ids


def sample_policy(
    rng: np.random.Generator,
    world: World,
    nn: int,
    grouping: bool,
    group_ids: np.ndarray,
) -> np.ndarray:
    if grouping:
        g = rng.choice(np.unique(group_ids))
        members = np.nonzero(group_ids == g)[0]
        if members.size < nn:
            members = np.arange(world.n_cbgs)
        return rng.choice(members, nn, replace=False)
    return rng.choice(world.n_cbgs, nn, replace=False)


def policy_point(world: World, idxs: np.ndarray) -> np.ndarray:
    """3-dim demographic average of the chosen CBGs (safe-distance space,
    reference ``…-crossgroup-safedistance.py:208-237``)."""
    d = world.demographics[idxs][:, 1:4]
    return d.mean(axis=0)


def check_safety(point, accepted, safe_distance: float, metric: str = "l2") -> bool:
    if not accepted:
        return True
    pts = np.stack(accepted)
    if metric == "l2":
        dist = np.sqrt(((pts - point) ** 2).sum(axis=1))
    elif metric == "l1":
        dist = np.abs(pts - point).sum(axis=1)
    else:  # single-dim: max per-dimension gap
        dist = np.abs(pts - point).max(axis=1)
    return bool((dist >= safe_distance).all())


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--msa_name", default="SanFrancisco")
    ap.add_argument("--synthetic", action="store_true", default=True)
    ap.add_argument("--num_samples", type=int, default=32)
    ap.add_argument("--NN", type=int, default=5, help="CBGs vaccinated per policy")
    ap.add_argument("--vaccination_ratio", type=float, default=0.01)
    ap.add_argument("--vaccination_time", type=int, default=1, help="in days")
    ap.add_argument("--num_seeds", type=int, default=8)
    ap.add_argument("--proportional", action="store_true", default=True)
    ap.add_argument("--distribution", choices=["fixed_nn", "flood"], default="fixed_nn",
                    help="fixed_nn: budget split over NN sampled CBGs (G5-G7); "
                         "flood: water-flood by a randomly-weighted demographic "
                         "ranking (the randombag driver's scheme, G8)")
    ap.add_argument("--grouping", action="store_true",
                    help="sample within hybrid demographic groups (G6 --grouping)")
    ap.add_argument("--safe_distance", type=float, default=0.0,
                    help="rejection-sampling distance in demographic space (G7)")
    ap.add_argument("--safe_metric", choices=["l2", "l1", "single"], default="l2")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n_cbgs", type=int, default=64)
    ap.add_argument("--n_pois", type=int, default=20)
    ap.add_argument("--hours", type=int, default=48)
    ap.add_argument("--random_seed", type=int, default=42)
    ap.add_argument("--quick_test", action="store_true")
    ap.add_argument("--approx", action="store_true",
                    help="hybrid fast count sampling (see sim.model.approx_draws)")
    ap.add_argument("--shards", type=int, default=0,
                    help="shard the policy batch over N devices (the reference's "
                         "multiprocessing pool as a mesh data axis)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    from pygcn_tpu.apps.common import set_process_title

    set_process_title("gt_gen")

    import jax

    if args.quick_test:
        args.num_seeds = 2
        args.num_samples = min(args.num_samples, 4)

    mesh = None
    if args.shards:
        from pygcn_tpu.parallel import make_mesh

        mesh = make_mesh([args.shards], ["data"])

    world = build_synthetic_world(
        n_cbgs=args.n_cbgs, n_pois=args.n_pois, hours=args.hours,
        msa_name=args.msa_name, vaccination_time=24 * args.vaccination_time,
        seed=args.random_seed,
    )
    group_ids = hybrid_groups(world)
    from pygcn_tpu.data.features import standardize

    standardized_demo = standardize(world.demographics)
    rng = np.random.default_rng(args.random_seed)
    key = jax.random.key(args.random_seed)

    fields = ["Vaccinated_Idxs", "Total_Cases", "Case_Rates_STD", "Total_Deaths", "Death_Rates_STD"]
    new_file = not os.path.exists(args.out)
    fh = open(args.out, "a", newline="")
    writer = csv.DictWriter(fh, fieldnames=fields)
    if new_file:
        writer.writeheader()
        # row 0: no-vaccination baseline
        key, sub = jax.random.split(key)
        rows = batch_policy_outcomes(world, np.zeros((1, world.n_cbgs)),
                                     args.num_seeds, sub, args.approx, mesh=mesh)
        writer.writerow(dict(zip(fields, ["[]"] + list(rows[0]))))
        fh.flush()

    accepted_points = []
    done = 0
    while done < args.num_samples:
        batch_policies = []
        attempts = 0
        while len(batch_policies) < min(args.batch, args.num_samples - done):
            attempts += 1
            if attempts > 200 * args.batch:
                print("rejection sampling stalled; relaxing safe distance")
                accepted_points.clear()
                attempts = 0
            idxs = sample_policy(rng, world, args.NN, args.grouping, group_ids)
            if args.safe_distance > 0:
                pt = policy_point(world, idxs)
                if not check_safety(pt, accepted_points, args.safe_distance, args.safe_metric):
                    continue
                accepted_points.append(pt)
            batch_policies.append(np.sort(idxs))

        if args.distribution == "flood":
            from pygcn_tpu.sim.policies import vaccine_distribution_flood

            # G8-style: rank CBGs by a random mixture of demographic features
            # and flood the budget down the ranking
            vectors = []
            for p in batch_policies:
                wgt = rng.dirichlet(np.ones(3))
                feature = (standardized_demo[:, 1:4] * wgt).sum(axis=1)
                vectors.append(vaccine_distribution_flood(
                    world.sizes, args.vaccination_ratio, feature,
                    ascending=bool(rng.integers(0, 2)), execution_ratio=1.0,
                ))
            vectors = np.stack(vectors)
            batch_policies = [np.nonzero(v)[0][: args.NN] for v in vectors]
        else:
            vectors = np.stack([
                vaccine_distribution_fixed_nn(
                    world.sizes, args.vaccination_ratio, args.NN,
                    proportional=args.proportional, target_idxs=p,
                )
                for p in batch_policies
            ])
        key, sub = jax.random.split(key)
        rows = batch_policy_outcomes(world, vectors, args.num_seeds, sub,
                                     args.approx, mesh=mesh)
        for p, r in zip(batch_policies, rows):
            writer.writerow(dict(zip(
                fields, ["[" + ", ".join(map(str, p.tolist())) + "]"] + list(r)
            )))
        fh.flush()  # incremental flush: crash keeps partial results
        done += len(batch_policies)
        print(f"{done}/{args.num_samples} samples written", flush=True)

    fh.close()
    print("done:", args.out)


if __name__ == "__main__":
    main()
