"""Round-4 products composite: tiles + colpanel residual under co-residency
(VERDICT r3 item 1).

r3 measured the pieces apart — tiles alone 105 ms, materialized colpanel
(full graph) 370 ms — but the composite died on co-residency: the same
tile op measured 788-2546 ms with the colpanel layout resident. These
cases try the named levers in fresh processes:

- colp_only  : full-graph ColPanelELL pw=64K materialized (session
               calibration; expect ~370 ms / 171M edges/s).
- comp_f32   : tiles f32 + colpanel RESIDUAL pw=64K, both resident;
               time each phase chained, report sum-of-parts.
- comp_bf16  : tiles stored bf16 (halves the tile working set; x cast
               inside the phase, f32 accumulate), colpanel residual f32.
- comp_bf16_xf32 : like comp_bf16 but phase order reversed (residual
               first) to probe allocation-order sensitivity.

Fresh process per case:  python tools/probe_composite_r4.py --case X
Needs /tmp/products_lp.npz + /tmp/products_split.npz (products_cache.py).

Target (VERDICT): composite >= 200M edges/s (<= 317 ms on 63.4M edges) or
a mechanism-isolating negative.
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


H = 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", required=True)
    ap.add_argument("--pw", type=int, default=65536)
    ap.add_argument("--met", type=int, default=64,
                    help="hybrid min_edges_per_tile for the split (64 uses "
                    "the cached r3 split; other values re-split inline)")
    ap.add_argument("--fine", action="store_true",
                    help="colp_only: fine bucket ladder (fill 0.88 vs 0.56)")
    ap.add_argument("--budget_gb", type=float, default=2.0,
                    help="tile budget in f32-GB for re-splits (bf16 halves "
                    "the device bytes)")
    args = ap.parse_args()
    case = args.case

    import dataclasses

    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    import pygcn_tpu.ops.colpanel as cpmod
    from pygcn_tpu.graph.graph import _build_bcsr
    from pygcn_tpu.ops.colpanel import build_col_panel_ell, col_panel_spmm_raw
    from pygcn_tpu.ops.pallas.bcsr_spmm import bcsr_spmm
    from pygcn_tpu.utils.benchmark import time_chained

    cpmod.MATERIALIZE_PANEL_SLICES = True
    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(0)
    t0 = time.time()

    if case == "colp_only":
        z = np.load("/tmp/products_lp.npz")
        n = int(z["n"])
        coo = sp.coo_matrix((z["data"], (z["row"], z["col"])), shape=(n, n))
        n_edges = int(coo.nnz)
        ks = ((1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256)
              if args.fine else (4, 8, 16, 32, 64, 128, 256))
        with jax.default_device(cpu):
            cp_host = build_col_panel_ell(coo.tocsc(), panel_width=args.pw,
                                          ks=ks)
        slots = sum(int(c.size) for p in cp_host.panels for c in p.cols)
        log(ks="fine" if args.fine else "default", slots=slots,
            fill=n_edges / max(slots, 1))
        del coo, z
        gc.collect()
        cp = jax.device_put(cp_host)
        del cp_host
        gc.collect()
        jax.block_until_ready(cp.panels[0].cols)
        x = jnp.asarray(rng.normal(size=(n, H)).astype(np.float32))
        x.block_until_ready()
        log(case=case, n_edges=n_edges, built_s=time.time() - t0)
        # regime sentinel (r5): fixed 2M-row gather from a 16K table
        st = jnp.asarray(rng.normal(size=(16384, H)).astype(np.float32))
        sidx = jnp.asarray(rng.integers(0, 16384, 2_000_000).astype(np.int32))
        s_fn = lambda v, idx: v + 1e-30 * jnp.take(v, idx, axis=0).sum(
            axis=0, keepdims=True)
        sent = time_chained(s_fn, st, iters=8, reps=2, args=(sidx,))
        log(sentinel_gather_ms=round(sent * 1e3, 3))
        t = time_chained(lambda v, c: v + 1e-30 * jnp.sum(
            col_panel_spmm_raw(c, v)), x, iters=8, reps=2, args=(cp,))
        log(case=case, t_ms=t * 1e3, edges_per_s=n_edges / t)
        log(stage="done")
        return

    # composite cases
    if args.met == 64:
        z = np.load("/tmp/products_split.npz")
        n = int(z["n"])
        tcoo = sp.coo_matrix((z["tdata"], (z["trow"], z["tcol"])), shape=(n, n))
        rcsc = sp.csc_matrix((z["rdata"], (z["rrow"], z["rcol"])), shape=(n, n))
        del z
    else:
        # re-split at the requested min_edges_per_tile from the LP cache
        # (bf16 tiles are ~free at products scale — real_bf16 probe:
        # 0.61 us/tile — so a LOWER met moves residual edges onto tiles)
        z = np.load("/tmp/products_lp.npz")
        n = int(z["n"])
        row, col, data = z["row"], z["col"], z["data"]
        del z
        n_block_cols = -(-n // 128)
        tile_ids = (row // 128).astype(np.int64) * n_block_cols + col // 128
        uniq, inverse, counts = np.unique(tile_ids, return_inverse=True,
                                          return_counts=True)
        qualifies = counts >= args.met
        max_tiles = int(args.budget_gb * (1 << 30)) // (128 * 128 * 4)
        if int(qualifies.sum()) > max_tiles:
            order = np.argsort(-counts)
            keep = np.zeros_like(qualifies)
            keep[order[qualifies[order]][:max_tiles]] = True
            qualifies = keep
        dense_tile = qualifies[inverse]
        tcoo = sp.coo_matrix(
            (data[dense_tile], (row[dense_tile], col[dense_tile])),
            shape=(n, n))
        rcsc = sp.csc_matrix(
            (data[~dense_tile], (row[~dense_tile], col[~dense_tile])),
            shape=(n, n))
        del row, col, data, tile_ids, uniq, inverse, counts, dense_tile
    tile_edges, resid_edges = int(tcoo.nnz), int(rcsc.nnz)
    n_edges = tile_edges + resid_edges
    gc.collect()

    bf16 = "bf16" in case
    with jax.default_device(cpu):
        b_host = _build_bcsr(tcoo, (128, 128))
        if bf16:
            b_host = dataclasses.replace(
                b_host, data=jnp.asarray(np.asarray(b_host.data), jnp.bfloat16))
        cp_host = build_col_panel_ell(rcsc, panel_width=args.pw)
    del tcoo, rcsc
    gc.collect()
    b = jax.device_put(b_host)
    cp = jax.device_put(cp_host)
    del b_host, cp_host
    gc.collect()
    jax.block_until_ready(b.data)
    jax.block_until_ready(cp.panels[0].cols)
    x = jnp.asarray(rng.normal(size=(n, H)).astype(np.float32))
    x.block_until_ready()
    tiles = int(b.data.shape[0])
    log(case=case, tiles=tiles, tile_edges=tile_edges,
        resid_edges=resid_edges, vrows=cp.n_vrows,
        tile_mb=tiles * 128 * 128 * (2 if bf16 else 4) / 2**20,
        built_s=time.time() - t0)

    # "pre" variant: materialize the bf16 copy of x ONCE (0.6 GB resident,
    # passed as a jit ARGUMENT — closure constants 413 on the tunnel) so
    # the tiles phase reads it directly — the per-iteration f32->bf16 cast
    # inside the loop reads 1.25 GB + writes 0.6 GB per step and may
    # itself be subject to the co-residency stall.
    x16 = None
    if bf16 and "pre" in case:
        x16 = x.astype(jnp.bfloat16)
        x16.block_until_ready()

    def tiles_step(v, bb, *xx):
        if xx:
            y = bcsr_spmm(bb, xx[0], n_rows=n, out_dtype=jnp.float32)
        else:
            vin = v.astype(jnp.bfloat16) if bf16 else v
            y = bcsr_spmm(bb, vin, n_rows=n, out_dtype=jnp.float32)
        return v + 1e-30 * jnp.sum(y)

    def resid_step(v, c):
        return v + 1e-30 * jnp.sum(col_panel_spmm_raw(c, v))

    if "fused" in case:
        # ONE jit: tiles + residual + add (the r3 f32 attempt SIGKILLed the
        # tunnel compile helper; bf16 halves the tile constants and this
        # retries it — a pass here unlocks the fused train step)
        def fused_step(v, bb, c):
            vin = v.astype(jnp.bfloat16) if bf16 else v
            y = bcsr_spmm(bb, vin, n_rows=n, out_dtype=jnp.float32)
            y = y + col_panel_spmm_raw(c, v)
            return v + 1e-30 * jnp.sum(y)

        t = time_chained(fused_step, x, iters=8, reps=2, args=(b, cp))
        log(case=case, composite_t_ms=t * 1e3, edges_per_s=n_edges / t,
            fused=True, target_200M_ms=n_edges / 200e6 * 1e3)
        log(stage="done")
        return

    tiles_extra = (b, x16) if x16 is not None else (b,)
    order = [("tiles", tiles_step, tiles_extra), ("resid", resid_step, (cp,))]
    if case.endswith("xf32"):
        order = order[::-1]

    total = 0.0
    for name, fn, extra in order:
        t = time_chained(fn, x, iters=8, reps=2, args=extra)
        edges = tile_edges if name == "tiles" else resid_edges
        log(case=case, phase=name, t_ms=t * 1e3,
            us_per_tile=(t * 1e6 / tiles) if name == "tiles" else None,
            edges_per_s=edges / t)
        total += t

    # the final add of the two partials (with everything resident)
    y1 = bcsr_spmm(b, x.astype(jnp.bfloat16) if bf16 else x, n_rows=n,
                   out_dtype=jnp.float32)
    y1.block_until_ready()
    t_add = time_chained(lambda v, yy: v + 1e-30 * jnp.sum(v + yy), x,
                         iters=8, reps=2, args=(y1,))
    log(case=case, phase="add", t_ms=t_add * 1e3)
    total += t_add
    log(case=case, composite_t_ms=total * 1e3, edges_per_s=n_edges / total,
        target_200M_ms=n_edges / 200e6 * 1e3)
    log(stage="done")


if __name__ == "__main__":
    main()
