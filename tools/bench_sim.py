"""Simulator throughput benchmark: vmapped policies × Monte-Carlo seeds.

The reference evaluates vaccination policies one-per-process over a
multiprocessing pool (NumPy, minutes per policy at production scale,
reference ``rl-policy-generator.py:308-321``). Here a *batch* of policies is
one vmapped jitted computation — this tool reports policies/second at a given
scale so the RL/gt-gen fan-out cost can be projected.

Usage::

    PYTHONPATH=. python tools/bench_sim.py [--n_cbgs 512 --n_pois 128 \
        --hours 168 --num_seeds 16 --batch 32]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n_cbgs", type=int, default=512)
    ap.add_argument("--n_pois", type=int, default=128)
    ap.add_argument("--hours", type=int, default=168)
    ap.add_argument("--total_hours", type=int, default=None)
    ap.add_argument("--num_seeds", type=int, default=16)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--approx", action="store_true", help="moment-matched Gaussian draws")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from pygcn_tpu.apps.common import build_synthetic_world
    from pygcn_tpu.sim.model import simulate

    world = build_synthetic_world(
        n_cbgs=args.n_cbgs, n_pois=args.n_pois, hours=args.hours,
        total_hours=args.total_hours, seed=0,
    )
    p = world.params
    rng = np.random.default_rng(0)
    frac = rng.uniform(0, 0.5, (args.batch, args.n_cbgs)).astype(np.float32)
    attack_vacs = jnp.asarray(np.asarray(p.attack_orig) * (1 - frac))

    if args.approx:
        p = dataclasses.replace(p, approx_draws=True)

    def one(attack_vac, k):
        params = dataclasses.replace(p, attack_vac=attack_vac)
        out = simulate(params, world.visits, args.num_seeds, k)
        return out["total_affected"].sum()

    run = jax.jit(jax.vmap(one))

    keys = jax.random.split(jax.random.key(0), args.batch)
    t0 = time.time()
    float(run(attack_vacs, keys).sum())
    compile_time = time.time() - t0

    times = []
    for r in range(args.reps):
        keys = jax.random.split(jax.random.key(r + 1), args.batch)
        t0 = time.time()
        float(run(attack_vacs, keys).sum())  # host materialization = real sync
        times.append(time.time() - t0)
    t = float(np.median(times))
    total_hours = p.total_hours
    print(f"world: {args.n_cbgs} CBGs x {args.n_pois} POIs, {total_hours}h horizon, "
          f"{args.num_seeds} seeds, batch {args.batch} (compile {compile_time:.1f}s)")
    print(f"batch time: {t:.3f}s -> {args.batch / t:.1f} policies/s "
          f"({args.batch * args.num_seeds * total_hours / t:,.0f} seed-hours/s)")


if __name__ == "__main__":
    main()
