"""Co-residency mechanism isolation: does an UNTOUCHED ballast allocation
degrade the bf16 tile op? (VERDICT r3 item 1's accepted alternative: a
mechanism-isolating negative.)

The composite probes show the tile op running 11.6 ms alone but 280 ms
with the colpanel residual layout co-resident (never touched during the
tile phase). Two candidate mechanisms:
  (a) total allocated HBM bytes / physical buffer placement — then a pure
      never-referenced ballast array of equal size reproduces the
      degradation;
  (b) something about the other layout's participation in the program
      (jit cache, executable residency) — then ballast changes nothing.

This runs the real products bf16 tile op with ballast sizes 0 / 0.5 / 1 /
2 / 4 GiB allocated BEFORE the operands (allocation history matters —
CLAUDE.md r3), in one process, logging us/tile per ballast size; then the
reverse order (operands first, ballast after) in the same process.

    python tools/probe_ballast_r4.py            (fresh process, TPU)
Needs /tmp/products_split.npz.
"""
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from pygcn_tpu.graph.graph import _build_bcsr
    from pygcn_tpu.ops.pallas.bcsr_spmm import bcsr_spmm
    from pygcn_tpu.utils.benchmark import time_chained

    cpu = jax.devices("cpu")[0]
    z = np.load("/tmp/products_split.npz")
    n = int(z["n"])
    tcoo = sp.coo_matrix((z["tdata"], (z["trow"], z["tcol"])), shape=(n, n))
    tile_edges = int(tcoo.nnz)
    del z
    with jax.default_device(cpu):
        b_host = _build_bcsr(tcoo, (128, 128))
        b_host = dataclasses.replace(
            b_host, data=jnp.asarray(np.asarray(b_host.data), jnp.bfloat16))
    del tcoo
    gc.collect()
    t = int(b_host.data.shape[0])

    def measure(tag, ballast_gib, ballast_first):
        b = None
        ballast = None
        if ballast_first and ballast_gib:
            ballast = jnp.zeros(int(ballast_gib * (1 << 30) // 4), jnp.float32)
            ballast.block_until_ready()
        b = jax.device_put(b_host)
        jax.block_until_ready(b.data)
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(b.n_block_cols * 128, 128)).astype(np.float32)
        ).astype(jnp.bfloat16)
        x.block_until_ready()
        if not ballast_first and ballast_gib:
            ballast = jnp.zeros(int(ballast_gib * (1 << 30) // 4), jnp.float32)
            ballast.block_until_ready()

        def step(v, bb):
            y = bcsr_spmm(bb, v, n_rows=n, out_dtype=jnp.float32)
            return v + (1e-30 * jnp.sum(y)).astype(v.dtype)

        tsec = time_chained(step, x, iters=12, reps=2, args=(b,))
        log(tag=tag, ballast_gib=ballast_gib, ballast_first=ballast_first,
            t_ms=tsec * 1e3, us_per_tile=tsec * 1e6 / t,
            tile_edges_per_s=tile_edges / tsec)
        del b, x, ballast
        gc.collect()

    # allocation-history note: each measurement reallocates operands, so
    # later rows inherit the process's allocation history — compare
    # adjacent rows, and compare row 0 against the fresh-process 11.6 ms.
    measure("baseline_fresh", 0, False)
    for g_ in (0.5, 1.0, 2.0, 4.0):
        measure("ballast_first", g_, True)
    measure("baseline_after_history", 0, False)
    log(stage="done")


if __name__ == "__main__":
    main()
