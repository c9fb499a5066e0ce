"""Arxiv-scale SpMM breakdown + levers (round 5, VERDICT item 3).

The bench.py headline has sat at 551-571M edges/s (28% of the v5e HBM
roofline) for three rounds; the products colpanel proved 76% is reachable.
This probe decomposes the arxiv hybrid op and tries the named levers, one
fresh process per case (CLAUDE.md protocol; arxiv-scale working sets have
been regime-insensitive, but fresh processes cost nothing):

- hybrid      : the headline op as bench.py runs it (--met, --tile_dtype)
- tiles       : the Pallas BCSR half alone
- resid       : the ELL residual half alone
- resid_colp  : the residual as ColPanelELL (--pw; small panels put every
                gather at the <=16K-row table rate)
- colp        : whole graph on ColPanelELL (--pw)
- ell         : whole graph on flat ELL (the round-1 layout, for reference)

Needs /tmp/arxiv_lp.npz (tools/arxiv_cache.py).
Usage: python tools/probe_arxiv_r5.py --case hybrid --met 32
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H = 128
ITERS = 20


def log(**kw):
    print(json.dumps(kw), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", required=True)
    ap.add_argument("--met", type=int, default=64, help="min_edges_per_tile")
    ap.add_argument("--tile_dtype", default=None, choices=[None, "bfloat16"])
    ap.add_argument("--pw", type=int, default=16384, help="colpanel width")
    ap.add_argument("--iters", type=int, default=ITERS)
    args = ap.parse_args()
    case = args.case

    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from pygcn_tpu.utils.benchmark import time_chained

    t0 = time.time()
    z = np.load("/tmp/arxiv_lp.npz")
    n = int(z["n"])
    coo = sp.coo_matrix((z["data"], (z["row"], z["col"])), shape=(n, n))
    n_edges = int(coo.nnz)
    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, H)).astype(np.float32))

    # regime sentinel: a fixed 2M-row gather from a 16K-row table, timed in
    # every probe process. The shared chip swings 12-52x across identical
    # runs (PERF_NOTES r4; an arxiv hybrid case measured 94.6 ms in the
    # same session where bench.py's best draw was 7.8 ms) — the sentinel
    # lets each case report WHICH regime it measured in, so cross-case
    # ratios use same-regime numbers only.
    st = jnp.asarray(rng.normal(size=(16384, H)).astype(np.float32))
    sidx = jnp.asarray(rng.integers(0, 16384, 2_000_000).astype(np.int32))
    s_fn = lambda v, idx: v + 1e-30 * jnp.take(v, idx, axis=0).sum(
        axis=0, keepdims=True)
    from pygcn_tpu.utils.benchmark import time_chained as _tc

    sent_ms = _tc(s_fn, st, iters=8, reps=2, args=(sidx,)) * 1e3
    log(sentinel_gather_ms=round(sent_ms, 3))

    if case in ("hybrid", "tiles", "resid"):
        from pygcn_tpu.ops.hybrid import build_hybrid, hybrid_spmm_raw

        with jax.default_device(cpu):
            hy = build_hybrid(
                coo, min_edges_per_tile=args.met,
                tile_dtype=args.tile_dtype,
            )
        hy = jax.device_put(hy)
        tiles = int(hy.bcsr.data.shape[0]) if hy.bcsr is not None else 0
        slots = sum(int(c.size) for c in hy.ell.cols)
        vrows = sum(int(r.size) for r in hy.ell.rows)
        log(case=case, met=args.met, tile_dtype=str(args.tile_dtype),
            tiles=tiles, tile_edges=hy.tile_edges,
            tile_frac=hy.tile_edges / n_edges, resid_slots=slots,
            resid_vrows=vrows, built_s=time.time() - t0)
        if case == "hybrid":
            fn = lambda v, h: v + 1e-30 * hybrid_spmm_raw(h, v)
        elif case == "tiles":
            from pygcn_tpu.ops.pallas.bcsr_spmm import bcsr_spmm

            fn = lambda v, h: v + 1e-30 * bcsr_spmm(h.bcsr, v, n_rows=h.n_rows)
        else:
            from pygcn_tpu.ops.ell import ell_spmm_raw

            fn = lambda v, h: v + 1e-30 * ell_spmm_raw(h.ell, v)
        t = min(time_chained(fn, x, iters=args.iters, reps=2, args=(hy,))
                for _ in range(3))
        ed = {"hybrid": n_edges, "tiles": hy.tile_edges,
              "resid": n_edges - hy.tile_edges}[case]
        log(case=case, met=args.met, t_ms=t * 1e3, case_edges=ed,
            edges_per_s=ed / t, whole_op_equiv=n_edges / t)
        log(stage="done")
        return

    if case == "resid_colp":
        from pygcn_tpu.ops.colpanel import col_panel_spmm_raw
        from pygcn_tpu.ops.hybrid import build_hybrid

        with jax.default_device(cpu):
            hy = build_hybrid(
                coo, min_edges_per_tile=args.met, residual="colpanel",
                panel_width=args.pw, tile_dtype=args.tile_dtype,
            )
        hy = jax.device_put(hy)
        pe = hy.ell
        log(case=case, met=args.met, pw=args.pw, panels=len(pe.panels),
            n_vrows=pe.n_vrows, resid_edges=n_edges - hy.tile_edges,
            built_s=time.time() - t0)
        fn = lambda v, p: v + 1e-30 * col_panel_spmm_raw(p, v)
        t = min(time_chained(fn, x, iters=args.iters, reps=2, args=(pe,))
                for _ in range(3))
        ed = n_edges - hy.tile_edges
        log(case=case, pw=args.pw, t_ms=t * 1e3, case_edges=ed,
            edges_per_s=ed / t)
        log(stage="done")
        return

    if case == "hybrid_colp":
        from pygcn_tpu.ops.hybrid import build_hybrid, hybrid_spmm_raw

        with jax.default_device(cpu):
            hy = build_hybrid(
                coo, min_edges_per_tile=args.met, residual="colpanel",
                panel_width=args.pw, tile_dtype=args.tile_dtype,
            )
        hy = jax.device_put(hy)
        pe = hy.ell
        log(case=case, met=args.met, pw=args.pw, panels=len(pe.panels),
            n_vrows=pe.n_vrows, tile_frac=hy.tile_edges / n_edges,
            built_s=time.time() - t0)
        fn = lambda v, h: v + 1e-30 * hybrid_spmm_raw(h, v)
        t = min(time_chained(fn, x, iters=args.iters, reps=2, args=(hy,))
                for _ in range(3))
        log(case=case, met=args.met, pw=args.pw, t_ms=t * 1e3,
            edges_per_s=n_edges / t)
        log(stage="done")
        return

    if case == "colp":
        from pygcn_tpu.ops.colpanel import build_col_panel_ell, col_panel_spmm_raw

        with jax.default_device(cpu):
            pe = build_col_panel_ell(coo.tocsc(), panel_width=args.pw)
        pe = jax.device_put(pe)
        log(case=case, pw=args.pw, panels=len(pe.panels), n_vrows=pe.n_vrows,
            built_s=time.time() - t0)
        fn = lambda v, p: v + 1e-30 * col_panel_spmm_raw(p, v)
        t = min(time_chained(fn, x, iters=args.iters, reps=2, args=(pe,))
                for _ in range(3))
        log(case=case, pw=args.pw, t_ms=t * 1e3, edges_per_s=n_edges / t)
        log(stage="done")
        return

    if case == "ell":
        from pygcn_tpu.ops.ell import build_ell, ell_spmm_raw

        with jax.default_device(cpu):
            ell = build_ell(coo.tocsr())
        ell = jax.device_put(ell)
        log(case=case, built_s=time.time() - t0)
        fn = lambda v, e: v + 1e-30 * ell_spmm_raw(e, v)
        t = min(time_chained(fn, x, iters=args.iters, reps=2, args=(ell,))
                for _ in range(3))
        log(case=case, t_ms=t * 1e3, edges_per_s=n_edges / t)
        log(stage="done")
        return

    raise SystemExit(f"unknown case {case}")


if __name__ == "__main__":
    main()
