"""Products dense-tile BCSR measured ALONE (no co-resident layouts)."""
import gc, json, sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np

def log(**kw): print(json.dumps(kw), flush=True)

import jax, jax.numpy as jnp
from pygcn_tpu.graph.datasets import community_graph
from pygcn_tpu.graph.graph import Graph
from pygcn_tpu.graph.transform import sym_normalize, symmetrize_max
from pygcn_tpu.parallel.partition import locality_order
from pygcn_tpu.ops.hybrid import build_hybrid
from pygcn_tpu.ops.pallas.bcsr_spmm import bcsr_spmm
from pygcn_tpu.utils.benchmark import time_chained

cpu = jax.devices("cpu")[0]
t0 = time.time()
adj = sym_normalize(symmetrize_max(community_graph(2_449_029, 13.0, seed=0, shuffle=True)))
with jax.default_device(cpu):
    g0 = Graph.from_scipy(adj, is_symmetric=True, build_dense=False,
                          build_bcsr=False, build_ell=False)
    perm = locality_order(g0, "lp")
    adj = adj.tocsr()[perm][:, perm].tocoo()
    del g0
    hy = build_hybrid(adj, min_edges_per_tile=64, tile_budget_bytes=1 << 30,
                      residual="ell")
    bcsr_host = hy.bcsr
    tile_edges = hy.tile_edges
n = adj.shape[0]
del hy, adj
gc.collect()
b = jax.device_put(bcsr_host)
del bcsr_host
gc.collect()
jax.block_until_ready(b.data)
x = jnp.asarray(np.random.default_rng(0).normal(size=(n, 128)).astype(np.float32))
x.block_until_ready()
log(stage="built", tiles=int(b.data.shape[0]), tile_edges=int(tile_edges),
    host_s=time.time() - t0)

t = time_chained(lambda v, bb: v + 1e-30 * jnp.sum(
    bcsr_spmm(bb, v, n_rows=n)), x, iters=12, reps=2, args=(b,))
log(measurement="tiles_alone", t_ms=t * 1e3,
    us_per_tile=t * 1e6 / int(b.data.shape[0]),
    edges_per_s=tile_edges / t)
log(stage="done")
