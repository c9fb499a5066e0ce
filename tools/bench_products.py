"""ogbn-products-scale single-chip SpMM composition sweep (VERDICT r2 #1a).

Measures, on the REAL TPU, the layout compositions round 2 left unmeasured at
BASELINE's products config (2.45M nodes / 63.4M edges, community graph,
shuffled ids -> native LP locality order):

- flat-storage bucketed ELL (r2: 1336 ms with 2-D blocks + lax.map chunking);
- ColPanelELL at pw = 16K / 32K / 64K (r2 measured only 64K/128K: 396/703 ms);
- hybrid BCSR tiles (1 GiB budget, met=64) + ColPanelELL residual at the same
  panel widths — both halves win individually at this scale but the composite
  was never measured (r2 hybrid+ELL-residual: 893 ms).

Writes one JSON line per measurement to the log so a crashed run keeps
results. Run as a background nohup script (tunnel compiles take minutes):

    cd /root/repo && nohup python tools/bench_products.py > /tmp/products_r3.log 2>&1 &

Reference analog: the single ``torch.spmm`` op (reference pygcn/layers.py:34);
this sweep is the TPU-native engine defending BASELINE's own large config.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import gc
import json
import time

import numpy as np

N_NODES = 2_449_029
AVG_DEG = 13.0  # ~63M directed edges after symmetrize_max (r2 proof config)
H = 128
ITERS = 8


def log(**kw):
    print(json.dumps(kw), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_nodes", type=int, default=N_NODES)
    ap.add_argument("--avg_degree", type=float, default=AVG_DEG)
    ap.add_argument("--skip", nargs="*", default=[],
                    help="measurement names to skip (ell, cp16, cp32, cp64, "
                    "hyb16, hyb32, hyb64)")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--residual_ks", type=int, nargs="*", default=None,
                    help="ELL bucket sizes for the hybrid residual (fewer "
                    "buckets -> smaller HLO; the fused hybrid+colpanel "
                    "program at 7 buckets exceeds the tunnel compile "
                    "helper's memory cap)")
    ap.add_argument("--unfused", action="store_true",
                    help="time the hybrid composite as two separate jitted "
                    "calls (tiles; residual) chained at the Python level - "
                    "a zero-fusion upper bound that dodges the compile cap; "
                    "includes 2 tunnel dispatches per iteration")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pygcn_tpu.graph.datasets import community_graph
    from pygcn_tpu.graph.graph import Graph
    from pygcn_tpu.graph.transform import sym_normalize, symmetrize_max
    from pygcn_tpu.parallel.partition import locality_order
    from pygcn_tpu.utils.benchmark import time_chained

    cpu = jax.devices("cpu")[0]

    t0 = time.time()
    adj = sym_normalize(symmetrize_max(
        community_graph(args.n_nodes, args.avg_degree, seed=0, shuffle=True)))
    log(stage="graph_built", n_nodes=adj.shape[0], n_edges=int(adj.nnz),
        host_s=time.time() - t0)

    t0 = time.time()
    with jax.default_device(cpu):
        g0 = Graph.from_scipy(adj, is_symmetric=True, build_dense=False,
                              build_bcsr=False, build_ell=False,
                              build_hybrid=False, build_colpanel=False)
        perm = locality_order(g0, "lp")
    del g0
    gc.collect()
    log(stage="lp_order", host_s=time.time() - t0)
    t0 = time.time()
    adj = adj.tocsr()[perm][:, perm].tocoo()
    log(stage="reorder", host_s=time.time() - t0)

    n = adj.shape[0]
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(n, H)).astype(np.float32))
    x.block_until_ready()
    log(stage="x_on_device", mb=n * H * 4 / 2**20)

    def want(name):
        if args.only is not None:
            return name in args.only
        return name not in args.skip

    def measure(name, fn, v, layout, n_edges, extra=None):
        # layout rides as a jit ARGUMENT: closed-over multi-GB layouts become
        # jaxpr constants and the tunnel's remote-compile 413s (CLAUDE.md).
        t = time_chained(fn, v, iters=ITERS, reps=2, args=(layout,))
        log(measurement=name, t_ms=t * 1e3, edges_per_s=n_edges / t,
            **(extra or {}))

    n_edges = int(adj.nnz)

    # --- flat bucketed ELL -------------------------------------------------
    if want("ell"):
        from pygcn_tpu.ops.ell import build_ell, ell_spmm_raw

        t0 = time.time()
        with jax.default_device(cpu):
            ell = build_ell(adj)
        ell = jax.device_put(ell)
        jax.block_until_ready(ell.cols)
        log(stage="ell_built", host_s=time.time() - t0,
            slots=int(sum(int(c.size) for c in ell.cols)))
        measure("ell_flat", lambda v, e: ell_spmm_raw(e, v), x, ell, n_edges)
        del ell
        gc.collect()

    # --- ColPanelELL width sweep ------------------------------------------
    from pygcn_tpu.ops.colpanel import build_col_panel_ell, col_panel_spmm_raw

    for name, pw in (("cp16", 16384), ("cp32", 32768), ("cp64", 65536),
                     ("cp32b", 32768), ("cp64b", 65536)):
        if not want(name):
            continue
        import pygcn_tpu.ops.colpanel as _cpmod
        _cpmod.MATERIALIZE_PANEL_SLICES = name.endswith("b")
        t0 = time.time()
        with jax.default_device(cpu):
            cp = build_col_panel_ell(adj, panel_width=pw)
        cp = jax.device_put(cp)
        jax.block_until_ready(cp.panels[0].cols)
        log(stage=f"{name}_built", host_s=time.time() - t0,
            panels=len(cp.panels), vrows=cp.n_vrows,
            vrows_per_row=cp.n_vrows / n)
        measure(name, lambda v, c: col_panel_spmm_raw(c, v), x, cp, n_edges,
                {"panel_width": pw})
        del cp
        gc.collect()

    # --- hybrid BCSR tiles + ColPanelELL residual -------------------------
    from pygcn_tpu.ops.hybrid import build_hybrid, hybrid_spmm_raw

    for name, pw in (("hyb16", 16384), ("hyb32", 32768), ("hyb64", 65536)):
        if not want(name):
            continue
        t0 = time.time()
        ks = tuple(args.residual_ks) if args.residual_ks else (4, 8, 16, 32, 64, 128, 256)
        with jax.default_device(cpu):
            hy = build_hybrid(adj, min_edges_per_tile=64,
                              tile_budget_bytes=1 << 30,
                              residual="colpanel", panel_width=pw, ks=ks)
        hy = jax.device_put(hy)
        jax.block_until_ready(hy.ell.panels[0].cols)
        log(stage=f"{name}_built", host_s=time.time() - t0,
            tile_edges=hy.tile_edges, tile_frac=hy.tile_edges / n_edges,
            tiles=int(hy.bcsr.data.shape[0]) if hy.bcsr is not None else 0)
        if args.unfused:
            import pygcn_tpu.ops.colpanel as _cpmod
            _cpmod.MATERIALIZE_PANEL_SLICES = True
            from pygcn_tpu.ops.colpanel import col_panel_spmm_raw as _cp
            from pygcn_tpu.ops.pallas.bcsr_spmm import bcsr_spmm as _bc

            t_tiles = time_chained(
                lambda v, b: _bc(b, v, n_rows=n), x, iters=ITERS, reps=2,
                args=(hy.bcsr,))
            log(measurement=name + "_tiles_only", t_ms=t_tiles * 1e3,
                tile_edges=hy.tile_edges,
                edges_per_s=hy.tile_edges / t_tiles)
            t_res = time_chained(
                lambda v, c: _cp(c, v), x, iters=ITERS, reps=2,
                args=(hy.ell,))
            resid_edges = n_edges - hy.tile_edges
            log(measurement=name + "_resid_only", t_ms=t_res * 1e3,
                resid_edges=resid_edges, edges_per_s=resid_edges / t_res)
            t = t_tiles + t_res
            log(measurement=name + "_sum_of_parts", t_ms=t * 1e3,
                edges_per_s=n_edges / t,
                note="two jitted calls measured separately; the fused "
                     "program exceeds the tunnel compile helper's memory",
                panel_width=pw, tile_frac=hy.tile_edges / n_edges)
        else:
            measure(name, lambda v, hh: hybrid_spmm_raw(hh, v), x, hy, n_edges,
                    {"panel_width": pw, "tile_frac": hy.tile_edges / n_edges})
        del hy
        gc.collect()

    log(stage="done")


if __name__ == "__main__":
    main()
