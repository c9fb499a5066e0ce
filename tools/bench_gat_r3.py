"""GAT round-3 measurements on the real TPU (VERDICT r2 #2).

Two configs, op-level (single ``gat_conv`` forward, and a train-step proxy
= fwd + grads wrt (s, a_src, a_dst) — the same accounting as the r2 GAT2
table: segmax 71.0 ms fwd / 197.5 ms step, bound one-pass 50.6 / 161.0):

A. continuity: the r1/r2 power-law graph (169K nodes, 2.29M edges, 8 heads
   x 8) — flash exact one-pass vs segmax 3-pass. No tiles qualify here, so
   this isolates the flash-combine change against the r2 'bound' numbers.
B. clustered: the bench.py community graph (169K nodes, 4.45M edges, LP
   locality order, ~70% of edges in 128x128 tiles) — the slot-native ELL
   path vs the fused Pallas tile-attention hybrid (ops/pallas/
   gat_tile_attn.py + ELL residual, exact flash merge).

One JSON line per measurement. Run: nohup python tools/bench_gat_r3.py >
/tmp/gat_r3.log 2>&1 &
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


def measure_conv(name, conv_fn, s, aux, n_edges):
    """conv_fn(s, a_src, a_dst, *extra) -> [N, h, f]; aux = (a_src, a_dst,
    *extra). EVERYTHING (graph layouts included) rides as jit arguments —
    closed-over layouts become jaxpr constants and the tunnel 413s."""
    import jax

    from pygcn_tpu.utils.benchmark import time_chained

    t_fwd = time_chained(conv_fn, s, iters=ITERS, reps=2, args=aux)

    def loss(v, asrc, adst, *extra):
        return (conv_fn(v, asrc, adst, *extra) ** 2).sum()

    grad = jax.grad(loss, argnums=(0, 1, 2))

    def train_step(v, asrc, adst, *extra):
        ds, dsrc, ddst = grad(v, asrc, adst, *extra)
        return v - 1e-6 * ds + 0.0 * (dsrc.sum() + ddst.sum())

    t_step = time_chained(train_step, s, iters=ITERS, reps=2, args=aux)
    log(measurement=name, fwd_ms=t_fwd * 1e3, step_ms=t_step * 1e3,
        edges=n_edges)


def main():
    import jax
    import jax.numpy as jnp

    from pygcn_tpu.graph.datasets import chung_lu_graph, community_graph
    from pygcn_tpu.graph.graph import Graph
    from pygcn_tpu.graph.transform import sym_normalize, symmetrize_max
    from pygcn_tpu.ops.gat import (
        build_edge_map, build_gat_tiles_t, gat_conv_ell, gat_conv_hybrid,
    )
    from pygcn_tpu.parallel.partition import locality_order

    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(0)
    s_np = rng.normal(size=(N, H_HEADS, F_HEAD)).astype(np.float32)
    a_src = jnp.asarray(rng.normal(size=(H_HEADS, F_HEAD)).astype(np.float32))
    a_dst = jnp.asarray(rng.normal(size=(H_HEADS, F_HEAD)).astype(np.float32))
    s = jnp.asarray(s_np)

    # --- config A: power-law continuity ---------------------------------
    t0 = time.time()
    adj = sym_normalize(symmetrize_max(chung_lu_graph(N, 7.1, seed=0)))
    with jax.default_device(cpu):
        g = Graph.from_scipy(adj, is_symmetric=True, build_dense=False,
                             build_bcsr=False, build_ell=True)
        em = build_edge_map(g)
    g, em = jax.device_put((g, em))
    log(stage="A_built", n_edges=g.n_edges, host_s=time.time() - t0)

    measure_conv(
        "A_ell_flash",
        lambda v, x1, x2, gg, ee: gat_conv_ell(gg, ee, v, x1, x2, stabilizer="flash"),
        s, (a_src, a_dst, g, em), g.n_edges)
    measure_conv(
        "A_ell_segmax",
        lambda v, x1, x2, gg, ee: gat_conv_ell(gg, ee, v, x1, x2, stabilizer="segmax"),
        s, (a_src, a_dst, g, em), g.n_edges)
    del g, em

    # --- config B: clustered + LP order + hybrid tiles ------------------
    t0 = time.time()
    adj = sym_normalize(symmetrize_max(
        community_graph(N, 13.3, seed=0, shuffle=True)))
    with jax.default_device(cpu):
        g0 = Graph.from_scipy(adj, is_symmetric=True, build_dense=False,
                              build_bcsr=False, build_ell=False)
        perm = locality_order(g0, "lp")
        adj = adj.tocsr()[perm][:, perm].tocoo()
        del g0
        g = Graph.from_scipy(
            adj, is_symmetric=True, build_dense=False, build_bcsr=False,
            build_ell=True, build_hybrid=True, hybrid_min_edges_per_tile=64,
        )
        em = build_edge_map(g)
        tiles_t = build_gat_tiles_t(g)
    g, em, tiles_t = jax.device_put((g, em, tiles_t))
    log(stage="B_built", n_edges=g.n_edges,
        tile_frac=g.hybrid.tile_edges / g.n_edges, host_s=time.time() - t0)

    measure_conv(
        "B_ell_flash",
        lambda v, x1, x2, gg, ee: gat_conv_ell(gg, ee, v, x1, x2, stabilizer="flash"),
        s, (a_src, a_dst, g, em), g.n_edges)
    measure_conv(
        "B_hybrid_tiles",
        lambda v, x1, x2, gg, tt: gat_conv_hybrid(gg, tt, v, x1, x2),
        s, (a_src, a_dst, g, tiles_t), g.n_edges)

    log(stage="done")


if __name__ == "__main__":
    main()
