"""Round-4 tile-kernel anomaly isolation (VERDICT r3 item 2).

r3 left a 3.5x unexplained: the REAL products tile set (19134 tiles,
~1 tile/block-row) measures 5.5 us/tile ALONE, while a synthetic probe at
the same occupancy and x-table size measures 1.56 us/tile. The synthetic
probe differed in two other ways: 4096 tiles (256 MB tile data) and a
4096-block-row output (256 MB) vs the real 19134 tiles (1.2 GB) writing a
2.45M-row output (1.25 GB). These cases split the candidates:

- synth_geom      : full real GEOMETRY (19133 tiles/rows/cols, random cols)
                    with synthetic coordinates. Matches real -> the
                    coordinate distribution is innocent and the working-set
                    size is the mechanism; matches the old probe -> the
                    real coordinate distribution is the problem.
- synth_table     : 19133 tiles/rows but the old probe's 512 MB x-table.
- synth_smallT    : 4096 tiles scattered over the full 19133-row grid (big
                    table + big output, small tile data).
- real_f32        : the real products tile set (expects ~105 ms, 5.5 us/t).
- real_bf16       : real tiles with bf16 data+x, f32 accumulate (halves
                    the dominant tile-read traffic).
- synth_geom_bf16 : geometry case in bf16.

Each case MUST run in its own fresh process (CLAUDE.md r3: throughput
depends on allocation history):  python tools/probe_tile_r4.py --case X
Real cases need /tmp/products_split.npz (tools/products_cache.py).
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


NBR = 19133  # products: ceil(2449029 / 128)
H = 128


def synth_bcsr(t, nbr, nbc, rng, dtype):
    from pygcn_tpu.graph.graph import BCSR
    import jax.numpy as jnp

    if t >= nbr:
        per_row = t // nbr
        br = np.repeat(np.arange(nbr, dtype=np.int32), per_row)
        br = np.concatenate([br, np.full(t - br.size, nbr - 1, np.int32)])
        br.sort()
    else:
        br = np.sort(rng.choice(nbr, t, replace=False)).astype(np.int32)
    bc = rng.integers(0, nbc, t).astype(np.int32)
    data = rng.normal(size=(t, 128, 128)).astype(dtype)
    ptr = np.zeros(nbr + 1, np.int64)
    np.add.at(ptr, br + 1, 1)
    ptr = np.cumsum(ptr).astype(np.int32)
    return BCSR(data=jnp.asarray(data), block_rows=jnp.asarray(br),
                block_cols=jnp.asarray(bc), block_row_ptr=jnp.asarray(ptr),
                tm=128, tk=128, n_block_rows=nbr, n_block_cols=nbc)


def real_bcsr(dtype):
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from pygcn_tpu.graph.graph import _build_bcsr

    z = np.load("/tmp/products_split.npz")
    n = int(z["n"])
    coo = sp.coo_matrix((z["tdata"], (z["trow"], z["tcol"])), shape=(n, n))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        b = _build_bcsr(coo, (128, 128))
    if dtype == np.float16 or dtype == "bfloat16":
        b = dataclasses_replace_data(b, jnp.asarray(np.asarray(b.data), jnp.bfloat16))
    return b, n, int(coo.nnz)


def dataclasses_replace_data(b, data):
    import dataclasses

    return dataclasses.replace(b, data=data)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", required=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pygcn_tpu.ops.pallas.bcsr_spmm import bcsr_spmm
    from pygcn_tpu.utils.benchmark import time_chained

    rng = np.random.default_rng(0)
    case = args.case
    t0 = time.time()

    bf16 = case.endswith("bf16")
    xdt = jnp.bfloat16 if bf16 else jnp.float32
    ddt = np.float32  # synth data cast below

    if case.startswith("real"):
        b_host, n, tile_edges = real_bcsr("bfloat16" if bf16 else np.float32)
        b = jax.device_put(b_host)
        del b_host
        gc.collect()
        nbc = b.n_block_cols
        t = int(b.data.shape[0])
    else:
        nbc = {"synth_geom": NBR, "synth_geom_bf16": NBR,
               "synth_table": 8192, "synth_smallT": NBR}[case]
        t = 4096 if case == "synth_smallT" else NBR
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            b_host = synth_bcsr(t, NBR, nbc, rng, np.float32)
            if bf16:
                b_host = dataclasses_replace_data(
                    b_host, jnp.asarray(np.asarray(b_host.data), jnp.bfloat16))
        b = jax.device_put(b_host)
        del b_host
        gc.collect()
        n = NBR * 128
        tile_edges = None

    jax.block_until_ready(b.data)
    x = jnp.asarray(rng.normal(size=(nbc * 128, H)).astype(np.float32))
    if bf16:
        x = x.astype(jnp.bfloat16)
    x.block_until_ready()
    tile_mb = t * 128 * 128 * (2 if bf16 else 4) / 2**20
    x_mb = x.size * (2 if bf16 else 4) / 2**20
    out_mb = NBR * 128 * H * 4 / 2**20
    log(case=case, tiles=t, nbr=NBR, nbc=nbc, tile_mb=tile_mb, x_mb=x_mb,
        out_mb=out_mb, built_s=time.time() - t0)

    def step(v, bb):
        y = bcsr_spmm(bb, v, n_rows=NBR * 128, out_dtype=jnp.float32)
        return v + (1e-30 * jnp.sum(y)).astype(v.dtype)

    tsec = time_chained(step, x, iters=12, reps=2, args=(b,))
    out = {"case": case, "t_ms": tsec * 1e3, "us_per_tile": tsec * 1e6 / t}
    if tile_edges:
        out["tile_edges"] = tile_edges
        out["edges_per_s"] = tile_edges / tsec
    log(**out)

    if case.startswith("real"):
        # numeric sanity for bf16: compare a row-block against f32 reference
        y = bcsr_spmm(b, x, n_rows=NBR * 128, out_dtype=jnp.float32)
        log(case=case, out_checksum=float(jnp.sum(jnp.abs(y[:4096]))))
    log(stage="done")


if __name__ == "__main__":
    main()
