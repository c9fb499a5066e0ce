"""Pin the BCSR kernel's per-tile cost vs occupancy and column locality.

Same tile COUNT, same x table, controlled variables:
- occupancy: tiles spread over many block rows (1/row) vs few (32/row)
- column order: random bc vs sequential bc (DMA locality)
"""
import json, sys
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np

def log(**kw): print(json.dumps(kw), flush=True)

import jax, jax.numpy as jnp
from pygcn_tpu.graph.graph import BCSR
from pygcn_tpu.ops.pallas.bcsr_spmm import bcsr_spmm
from pygcn_tpu.utils.benchmark import time_chained

T = 4096          # tiles
NBC = 8192        # block cols (x table = 1M rows x 128 = 512 MB)
H = 128
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(NBC * 128, H)).astype(np.float32))
x.block_until_ready()

def make(nbr, seq_cols):
    per_row = T // nbr
    br = np.repeat(np.arange(nbr, dtype=np.int32), per_row)
    if seq_cols:
        bc = (np.arange(T, dtype=np.int32) % NBC)
    else:
        bc = rng.integers(0, NBC, T).astype(np.int32)
    data = rng.normal(size=(T, 128, 128)).astype(np.float32)
    ptr = np.zeros(nbr + 1, np.int64)
    np.add.at(ptr, br + 1, 1)
    ptr = np.cumsum(ptr).astype(np.int32)
    return BCSR(data=jnp.asarray(data), block_rows=jnp.asarray(br),
                block_cols=jnp.asarray(bc), block_row_ptr=jnp.asarray(ptr),
                tm=128, tk=128, n_block_rows=nbr, n_block_cols=NBC)

for nbr, seq in ((4096, False), (4096, True), (128, False), (128, True)):
    b = jax.device_put(make(nbr, seq))
    # chain keeps x's shape; 1e-30 scaling (not *0) so DCE can't drop the op
    t = time_chained(
        lambda v, bb: v + 1e-30 * jnp.sum(bcsr_spmm(bb, v, n_rows=bb.n_block_rows * 128)),
        x, iters=12, reps=2, args=(b,))
    log(tiles=T, block_rows=nbr, tiles_per_row=T // nbr,
        seq_cols=seq, t_ms=t * 1e3, us_per_tile=t * 1e6 / T)
    del b
log(stage="done")
