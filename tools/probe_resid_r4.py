"""Is the hybrid composite's colpanel RESIDUAL intrinsically slow, or
co-residency-degraded? (r4 follow-up to probe_composite_r4.)

comp_f32/comp_bf16 measured the residual colpanel (42.4M non-tile edges,
12.5M vrows) at 913-976 ms with the BCSR tiles resident — 10x below the
full-graph colpanel's per-vrow rate (63.4M edges / 14M vrows in 113 ms).
Two readings are possible:

- co-residency: the tile buffers resident alongside degrade the gathers;
- intrinsic: the residual IS the badly-scattered edge set (dense tiles
  removed), and its gathers lose the panel-table locality the LP-ordered
  full graph enjoys.

This probe builds ONLY the residual colpanel (nothing else resident) and
times it — fresh process, same accounting. ~250 ms → co-residency;
~900 ms → intrinsic scatter cost (and the composite negative is about the
residual's structure, not the allocator).

Run: python tools/probe_resid_r4.py  (needs /tmp/products_split.npz)
"""
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H = 128


def log(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    import pygcn_tpu.ops.colpanel as cpmod
    from pygcn_tpu.ops.colpanel import build_col_panel_ell, col_panel_spmm_raw
    from pygcn_tpu.utils.benchmark import time_chained

    cpmod.MATERIALIZE_PANEL_SLICES = True
    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(0)
    t0 = time.time()

    z = np.load("/tmp/products_split.npz")
    n = int(z["n"])
    rcsc = sp.csc_matrix((z["rdata"], (z["rrow"], z["rcol"])), shape=(n, n))
    del z
    resid_edges = int(rcsc.nnz)
    with jax.default_device(cpu):
        cp_host = build_col_panel_ell(rcsc, panel_width=65536)
    del rcsc
    gc.collect()
    cp = jax.device_put(cp_host)
    del cp_host
    gc.collect()
    jax.block_until_ready(cp.panels[0].cols)
    x = jnp.asarray(rng.normal(size=(n, H)).astype(np.float32))
    x.block_until_ready()
    log(case="resid_only", resid_edges=resid_edges, vrows=cp.n_vrows,
        built_s=time.time() - t0)
    t = time_chained(lambda v, c: v + 1e-30 * jnp.sum(
        col_panel_spmm_raw(c, v)), x, iters=8, reps=2, args=(cp,))
    log(case="resid_only", t_ms=t * 1e3, edges_per_s=resid_edges / t,
        vrows_per_s=cp.n_vrows / t)
    log(stage="done")


if __name__ == "__main__":
    main()
