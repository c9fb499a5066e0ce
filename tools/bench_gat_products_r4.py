"""Products-scale GAT / SAGE on the ColPanelELL layout (round-4b).

The >1M-row auto-policy layout (colpanel) had no attention path until
``ops/gat_colpanel``; this probe measures it on the cached ogbn-products-
scale graph (2.45M nodes / 63.4M edges, LP-ordered). Cases, one fresh
process each (CLAUDE.md r4 protocol: report the BEST of >=3 fresh
processes; single draws are samples from a heavy-tailed external regime):

- gat_fwd  : gat_conv_colpanel forward, 8 heads x 8 (the arxiv GAT config).
- gat_step : forward + grads wrt (s, a_src, a_dst) — the attention part of
             a train step (chunked buckets rematerialize, flash-style).
- gatv2_fwd: the v2 variant's forward.
- sage_step: GraphSAGE-mean layer train step — spmm(colpanel) + two GEMMs
             + relu, grads wrt both weight matrices (H=128 in/out).

Needs /tmp/products_lp.npz (tools/products_cache.py).
Usage: python tools/bench_gat_products_r4.py --case gat_fwd
"""
import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(**kw):
    print(json.dumps(kw), flush=True)


GAT_H, GAT_F = 8, 16  # 128 lanes: a 64-lane H*F pads 2x on TPU tiles
# (the products OOM dump showed every wide buffer at 2.0x expansion);
# 8x16 costs the same padded bytes and wastes none
SAGE_H = 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", required=True)
    ap.add_argument("--pw", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--group", type=int, default=0,
                    help="override gat_colpanel.ATTN_GROUP_PANELS (0 = keep)")
    ap.add_argument("--budget", type=int, default=0,
                    help="override gat_colpanel.ATTN_CHUNK_BUDGET_ELEMS log2 "
                    "(0 = keep)")
    ap.add_argument("--fine", action="store_true",
                    help="fine bucket ladder (fill 0.88 vs 0.56 at products)")
    ap.add_argument("--packed", action="store_true",
                    help="packed v1 source-logit tables (F-times-smaller "
                    "gather buffers; ops/gat_colpanel.PACK_LOGIT_TABLES)")
    ap.add_argument("--memstats", action="store_true",
                    help="AOT-compile one application first and log the "
                    "compiled memory assignment (pins the HBM schedule)")
    args = ap.parse_args()
    case = args.case

    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    import pygcn_tpu.ops.gat_colpanel as gcp
    from pygcn_tpu.ops.colpanel import build_col_panel_ell, col_panel_spmm_raw
    from pygcn_tpu.ops.gat_colpanel import gat_conv_colpanel, gatv2_conv_colpanel
    from pygcn_tpu.utils.benchmark import time_chained

    if args.group:
        gcp.ATTN_GROUP_PANELS = args.group
    if args.budget:
        gcp.ATTN_CHUNK_BUDGET_ELEMS = 1 << args.budget
    if args.packed:
        gcp.PACK_LOGIT_TABLES = True

    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(0)
    t0 = time.time()

    z = np.load("/tmp/products_lp.npz")
    n = int(z["n"])
    coo = sp.coo_matrix((z["data"], (z["row"], z["col"])), shape=(n, n))
    n_edges = int(coo.nnz)
    ks = ((1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256)
          if args.fine else (4, 8, 16, 32, 64, 128, 256))
    with jax.default_device(cpu):
        cp_host = build_col_panel_ell(coo.tocsc(), panel_width=args.pw, ks=ks)
    del coo, z
    gc.collect()
    cp = jax.device_put(cp_host)
    del cp_host
    gc.collect()
    jax.block_until_ready(cp.panels[0].cols)
    log(case=case, n_edges=n_edges, n_vrows=cp.n_vrows,
        built_s=time.time() - t0)

    # regime sentinel (PERF_NOTES r4: 52x fresh-process swings): fixed
    # 2M-row gather from a 16K table — reports which regime this process
    # measured in so best-of-N draws are interpretable
    import jax.numpy as _jnp

    st = _jnp.asarray(rng.normal(size=(16384, 128)).astype(np.float32))
    sidx = _jnp.asarray(rng.integers(0, 16384, 2_000_000).astype(np.int32))
    s_fn = lambda v, idx: v + 1e-30 * _jnp.take(v, idx, axis=0).sum(
        axis=0, keepdims=True)
    sent_ms = time_chained(s_fn, st, iters=8, reps=2, args=(sidx,)) * 1e3
    log(sentinel_gather_ms=round(sent_ms, 3))

    if case in ("gat_step2", "gatv2_step2"):
        # TWO-PROGRAM train step: the one-program step cannot fit the
        # 15.75 GB chip (fwd alone assigns 12.58 GB and the backward adds
        # >=3 more [N, H·F] tables — measured 16.25 GB at budget 1<<25,
        # 18.7 at 1<<24 AOT). Structure the step as jit(fwd_with_residuals)
        # + jit(bwd_from_residuals), residuals staying device-resident —
        # the compile-splitting lesson from PERF_NOTES r3, applied as the
        # production step structure rather than a timing trick. Reported
        # time is one chained fwd+bwd pair per iteration.
        h, f = GAT_H, GAT_F
        s = jnp.asarray(rng.normal(size=(n, h, f)).astype(np.float32))
        a1 = jnp.asarray(rng.normal(size=(h, f)).astype(np.float32) * 0.1)
        a2 = jnp.asarray(rng.normal(size=(h, f)).astype(np.float32) * 0.1)
        s.block_until_ready()
        v2 = case.startswith("gatv2")
        fwd_raw, bwd_raw = gcp.split_attention_step(0.2, v2=v2)
        if v2:
            fwd_fn = jax.jit(lambda c, v, x1: fwd_raw(c, v, v, x1))
            bwd_fn = jax.jit(
                lambda c, v, x1, out, aux, d: bwd_raw(c, v, v, x1, out, aux, d))
        else:
            fwd_fn = jax.jit(fwd_raw)
            bwd_fn = jax.jit(bwd_raw)

        def pair(v):
            if v2:
                out, aux = fwd_fn(cp, v, a1)
                grads = bwd_fn(cp, v, a1, out, aux, jnp.ones_like(out))
            else:
                out, aux = fwd_fn(cp, v, a1, a2)
                grads = bwd_fn(cp, v, a1, a2, out, aux, jnp.ones_like(out))
            return grads[0]  # ds

        # warm both compiles, then time chained pairs (host dispatch per
        # pair rides the tunnel; both compiles are cached after iter 1)
        t0c = time.time()
        ds = pair(s)
        jax.block_until_ready(ds)
        log(case=case, compile_plus_first_s=time.time() - t0c)
        t0 = time.time()
        reps = args.iters
        v = s
        for _ in range(reps):
            ds = pair(v)
            v = v + 1e-30 * ds  # chain: each pair depends on the previous
        # materialize a scalar to close the async chain
        float(jnp.sum(v[0]))
        t = (time.time() - t0) / reps
        log(case=case, t_ms=t * 1e3, edges_per_s=n_edges / t,
            note="two-program step; per-pair host dispatch included")
        log(stage="done")
        return

    if case in ("gat_fwd", "gat_step", "gatv2_fwd", "gatv2_step"):
        h, f = GAT_H, GAT_F
        s = jnp.asarray(rng.normal(size=(n, h, f)).astype(np.float32))
        a1 = jnp.asarray(rng.normal(size=(h, f)).astype(np.float32) * 0.1)
        a2 = jnp.asarray(rng.normal(size=(h, f)).astype(np.float32) * 0.1)
        s.block_until_ready()
        if case.startswith("gatv2"):
            # v2 signature: (graph, s_l, s_r, a); share-weights config
            conv = lambda c, v, x1, x2: gatv2_conv_colpanel(c, v, v, x1, 0.2)
        else:
            conv = lambda c, v, x1, x2: gat_conv_colpanel(c, v, x1, x2, 0.2)
        if case.endswith("fwd"):
            fn = lambda v, c, x1, x2: v + 1e-30 * conv(c, v, x1, x2)
        else:
            def loss(v, c, x1, x2):
                return jnp.sum(jnp.tanh(conv(c, v, x1, x2)))

            fn = lambda v, c, x1, x2: v - 1e-30 * jax.grad(loss)(v, c, x1, x2)
        if args.memstats:
            from pygcn_tpu.utils.benchmark import memory_stats

            ms = memory_stats(fn, s, cp, a1, a2)
            log(case=case, memstats=ms,
                total_hbm_gb=ms["total_hbm_bytes"] / 2**30)
        t = time_chained(fn, s, iters=args.iters, reps=2, args=(cp, a1, a2))
        log(case=case, t_ms=t * 1e3, edges_per_s=n_edges / t)
        log(stage="done")
        return

    if case == "sage_step":
        x = jnp.asarray(rng.normal(size=(n, SAGE_H)).astype(np.float32))
        w_self = jnp.asarray(rng.normal(size=(SAGE_H, SAGE_H)).astype(np.float32) * 0.05)
        w_nb = jnp.asarray(rng.normal(size=(SAGE_H, SAGE_H)).astype(np.float32) * 0.05)
        x.block_until_ready()

        def loss(ws, wn, v, c):
            agg = col_panel_spmm_raw(c, v)  # mean-agg: A_hat is row-normalized
            out = jax.nn.relu(v @ ws + agg @ wn)
            return jnp.sum(jnp.tanh(out))

        def fn(v, c, ws, wn):
            gs, gn = jax.grad(loss, argnums=(0, 1))(ws, wn, v, c)
            return v + 1e-30 * (jnp.sum(gs) + jnp.sum(gn))

        t = time_chained(fn, x, iters=args.iters, reps=2, args=(cp, w_self, w_nb))
        log(case=case, t_ms=t * 1e3, edges_per_s=n_edges / t)
        log(stage="done")
        return

    raise SystemExit(f"unknown case {case}")


if __name__ == "__main__":
    main()
