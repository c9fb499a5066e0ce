"""Where does the arxiv GAT train step spend its non-forward 100+ ms?
(VERDICT r4 item 5: fwd 140 ms vs step 240 ms for v2; v1 similar.)

Decomposition hypothesis: the one-pass backward's cost is the two
scatter-adds autodiff derives for the ``jnp.take`` reads (features and
source logits: d(take)(x)[i] += g — E slot rows into the [N, 128] table),
which run at the (slow) big-table scatter rate where the forward's
gathers at least ride the gather rate. Unit probes measure those rates
directly; the case timings bound the achievable win from a custom VJP
that re-expresses both scatters as transpose-layout gathers+segment-sums
(the ``spmm``/``spmm_t`` trick, ops/spmm.py).

Cases (fresh process each): v1_fwd, v1_step, v1_grad_s (grad wrt features
only), units (gather/scatter/segment_sum at the op's own shapes).
Needs /tmp/arxiv_lp.npz. Usage: python tools/probe_gat_arxiv_r5.py --case v1_step
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_HEADS, F_HEAD = 8, 16  # 128 lanes
ITERS = 8


def log(**kw):
    print(json.dumps(kw), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", required=True)
    ap.add_argument("--iters", type=int, default=ITERS)
    args = ap.parse_args()
    case = args.case

    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from pygcn_tpu.graph.graph import Graph
    from pygcn_tpu.ops.gat import build_edge_map, gat_conv_ell_onepass
    from pygcn_tpu.utils.benchmark import time_chained

    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(0)
    t0 = time.time()
    z = np.load("/tmp/arxiv_lp.npz")
    n = int(z["n"])
    coo = sp.coo_matrix((z["data"], (z["row"], z["col"])), shape=(n, n))
    with jax.default_device(cpu):
        g = Graph.from_scipy(
            coo, is_symmetric=True, build_dense=False, build_bcsr=False,
            build_ell=True, build_hybrid=False, build_colpanel=False,
        )
        em = build_edge_map(g)
    g, em = jax.device_put((g, em))
    slots = sum(int(c.size) for c in g.ell.cols)
    vrows = sum(int(r.size) for r in g.ell.rows)
    log(case=case, n_edges=g.n_edges, slots=slots, vrows=vrows,
        built_s=time.time() - t0)

    # regime sentinel (see probe_arxiv_r5): fixed 2M-row gather, 16K table
    st = jnp.asarray(rng.normal(size=(16384, N_HEADS * F_HEAD)).astype(np.float32))
    sidx = jnp.asarray(rng.integers(0, 16384, 2_000_000).astype(np.int32))
    s_fn = lambda v, idx: v + 1e-30 * jnp.take(v, idx, axis=0).sum(
        axis=0, keepdims=True)
    sent_ms = time_chained(s_fn, st, iters=8, reps=2, args=(sidx,)) * 1e3
    log(sentinel_gather_ms=round(sent_ms, 3))

    hf = N_HEADS * F_HEAD
    s = jnp.asarray(rng.normal(size=(n, N_HEADS, F_HEAD)).astype(np.float32))
    a1 = jnp.asarray(rng.normal(size=(N_HEADS, F_HEAD)).astype(np.float32) * .1)
    a2 = jnp.asarray(rng.normal(size=(N_HEADS, F_HEAD)).astype(np.float32) * .1)

    if case == "v1_fwd":
        fn = lambda v, gg, ee, x1, x2: v + 1e-30 * gat_conv_ell_onepass(
            gg, ee, v, x1, x2, 0.2)
        t = time_chained(fn, s, iters=args.iters, reps=2, args=(g, em, a1, a2))
        log(case=case, t_ms=t * 1e3, edges_per_s=g.n_edges / t)
    elif case in ("v1_step", "v1_grad_s", "v1_grad_a"):
        def loss(v, x1, x2, gg, ee):
            return jnp.sum(jnp.tanh(gat_conv_ell_onepass(gg, ee, v, x1, x2, 0.2)))

        argnums = {"v1_step": (0, 1, 2), "v1_grad_s": (0,),
                   "v1_grad_a": (1, 2)}[case]
        grad = jax.grad(loss, argnums=argnums)

        def fn(v, gg, ee, x1, x2):
            gs = grad(v, x1, x2, gg, ee)
            return v - 1e-30 * sum(jnp.sum(t) for t in gs)

        t = time_chained(fn, s, iters=args.iters, reps=2, args=(g, em, a1, a2))
        log(case=case, t_ms=t * 1e3, edges_per_s=g.n_edges / t)
    elif case == "units":
        flat_cols = jnp.concatenate([c.reshape(-1) for c in g.ell.cols])
        all_rows = jnp.concatenate(list(g.ell.rows))
        x2 = s.reshape(n, hf)
        gth = lambda v, idx: v + 1e-30 * jnp.take(v, idx, axis=0).sum(
            axis=0, keepdims=True)
        t = time_chained(gth, x2, iters=args.iters, reps=2, args=(flat_cols,))
        log(case="unit_gather", t_ms=t * 1e3, rows_per_s=slots / t)

        # loop-DEPENDENT payloads (a constant payload lets XLA hoist the
        # scatter out of the timing loop entirely — measured 14.5B rows/s,
        # i.e. nothing): gather-then-scatter and gather-then-segsum; report
        # both combined and gather-subtracted estimates.
        t_g = t

        def gsct(v, idx):
            p = jnp.take(v, idx, axis=0)
            z0 = jnp.zeros((n, hf), jnp.float32).at[idx].add(p)
            return v + 1e-30 * z0

        t = time_chained(gsct, x2, iters=args.iters, reps=2,
                         args=(flat_cols,))
        log(case="unit_gather_scatter", t_ms=t * 1e3,
            scatter_only_ms=(t - t_g) * 1e3,
            scatter_rows_per_s=slots / max(t - t_g, 1e-9))

        def gseg(v, ridx):
            p = jnp.take(v, ridx, axis=0)
            return v + 1e-30 * jax.ops.segment_sum(p, ridx, num_segments=n)

        t = time_chained(gseg, x2, iters=args.iters, reps=2,
                         args=(all_rows,))
        # vrow gather is ~vrows/slots of t_g
        t_vg = t_g * vrows / slots
        log(case="unit_gather_segsum", t_ms=t * 1e3,
            segsum_only_ms=(t - t_vg) * 1e3,
            segsum_rows_per_s=vrows / max(t - t_vg, 1e-9))
    else:
        raise SystemExit(f"unknown case {case}")
    log(stage="done")


if __name__ == "__main__":
    main()
