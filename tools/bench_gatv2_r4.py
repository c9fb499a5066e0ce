"""GATv2 tile-attention vs slot-native one-pass on the real TPU
(VERDICT r3 item 5).

Config: the clustered arxiv graph (169K nodes, 4.45M edges, LP locality
order, ~70% of edges in 128x128 tiles), 8 heads x 8 — the same config
where v1's tile-attention hybrid measured 142.2 ms/step vs 363.9 for the
ELL path (r3). Measures, in ONE session for a clean A/B:

- v2_ell_onepass : gatv2_conv_ell_onepass (r3 default, 146.5 ms/step on
                   the power-law config);
- v2_hybrid      : gatv2_conv_hybrid (fused Pallas v2 tile kernels +
                   slot-native residual).

Both as forward and as a train-step proxy (fwd + grads wrt s_l, s_r, a —
same accounting as the r3 tables). One JSON line per measurement.
Run: nohup python tools/bench_gatv2_r4.py > /tmp/gatv2_r4.log 2>&1 &
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np

N = 169_343
H_HEADS = 8
F_HEAD = 8
ITERS = 8


def log(**kw):
    print(json.dumps(kw), flush=True)


def measure(name, conv_fn, s_l, s_r, a, extra, n_edges):
    import jax

    from pygcn_tpu.utils.benchmark import time_chained

    t_fwd = time_chained(lambda v, *e: conv_fn(v, s_r, a, *e),
                         s_l, iters=ITERS, reps=2, args=extra)

    def loss(sl, sr, av, *e):
        return (conv_fn(sl, sr, av, *e) ** 2).sum()

    grad = jax.grad(loss, argnums=(0, 1, 2))

    def train_step(sl, *e):
        dsl, dsr, da = grad(sl, s_r, a, *e)
        return sl - 1e-6 * dsl + 0.0 * (dsr.sum() + da.sum())

    t_step = time_chained(train_step, s_l, iters=ITERS, reps=2, args=extra)
    log(measurement=name, fwd_ms=t_fwd * 1e3, step_ms=t_step * 1e3,
        ns_per_edge_step=t_step * 1e9 / n_edges)


def main():
    import jax
    import jax.numpy as jnp

    from pygcn_tpu.graph.datasets import community_graph
    from pygcn_tpu.graph.graph import Graph
    from pygcn_tpu.graph.transform import sym_normalize, symmetrize_max
    from pygcn_tpu.ops.gat import (
        build_edge_map, build_gat_tiles_t, gatv2_conv_ell_onepass,
        gatv2_conv_hybrid,
    )
    from pygcn_tpu.parallel.partition import locality_order

    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(0)
    s_l = jnp.asarray(rng.normal(size=(N, H_HEADS, F_HEAD)).astype(np.float32))
    s_r = jnp.asarray(rng.normal(size=(N, H_HEADS, F_HEAD)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(H_HEADS, F_HEAD)).astype(np.float32))

    t0 = time.time()
    adj = sym_normalize(symmetrize_max(
        community_graph(N, 13.3, seed=0, shuffle=True)))
    with jax.default_device(cpu):
        g0 = Graph.from_scipy(adj, is_symmetric=True, build_dense=False,
                              build_bcsr=False, build_ell=False,
                              build_hybrid=False, build_colpanel=False)
        perm = locality_order(g0, "lp")
        adj = adj.tocsr()[perm][:, perm].tocoo()
        del g0
        g = Graph.from_scipy(
            adj, is_symmetric=True, build_dense=False, build_bcsr=False,
            build_ell=True, build_hybrid=True, build_colpanel=False,
            hybrid_min_edges_per_tile=64,
        )
        em = build_edge_map(g)
        tiles_t = build_gat_tiles_t(g)
    g, em, tiles_t = jax.device_put((g, em, tiles_t))
    log(stage="built", n_edges=g.n_edges,
        tile_frac=g.hybrid.tile_edges / g.n_edges, host_s=time.time() - t0)

    measure("v2_ell_onepass",
            lambda sl, sr, av, gg, ee: gatv2_conv_ell_onepass(gg, ee, sl, sr, av),
            s_l, s_r, a, (g, em), g.n_edges)
    measure("v2_hybrid",
            lambda sl, sr, av, gg, tt: gatv2_conv_hybrid(gg, tt, sl, sr, av),
            s_l, s_r, a, (g, tiles_t), g.n_edges)
    log(stage="done")


if __name__ == "__main__":
    main()
