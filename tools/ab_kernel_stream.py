"""Same-session A/B: revisit vs streamed kernels (arxiv configs)."""
import json, sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np

def log(**kw): print(json.dumps(kw), flush=True)

import jax, jax.numpy as jnp
import pygcn_tpu.ops.pallas.bcsr_spmm as bmod
import pygcn_tpu.ops.pallas.gat_tile_attn as gmod
from pygcn_tpu.graph.datasets import community_graph
from pygcn_tpu.graph.graph import Graph
from pygcn_tpu.graph.transform import sym_normalize, symmetrize_max
from pygcn_tpu.parallel.partition import locality_order
from pygcn_tpu.ops.gat import build_edge_map, build_gat_tiles_t, gat_conv_hybrid
from pygcn_tpu.ops.hybrid import hybrid_spmm_raw
from pygcn_tpu.utils.benchmark import time_chained

cpu = jax.devices("cpu")[0]
N = 169_343
adj = sym_normalize(symmetrize_max(community_graph(N, 13.3, seed=0, shuffle=True)))
with jax.default_device(cpu):
    g0 = Graph.from_scipy(adj, is_symmetric=True, build_dense=False, build_bcsr=False, build_ell=False)
    perm = locality_order(g0, "lp")
    adj = adj.tocsr()[perm][:, perm].tocoo()
    del g0
    g = Graph.from_scipy(adj, is_symmetric=True, build_dense=False, build_bcsr=False,
                         build_ell=True, build_hybrid=True, hybrid_min_edges_per_tile=64)
    tiles_t = build_gat_tiles_t(g)
g, tiles_t = jax.device_put((g, tiles_t))
t_tiles = int(g.hybrid.bcsr.data.shape[0])
log(stage="built", tiles=t_tiles, block_rows=int(g.hybrid.bcsr.n_block_rows),
    tile_frac=g.hybrid.tile_edges / g.n_edges)

x = jnp.asarray(np.random.default_rng(0).normal(size=(N, 128)).astype(np.float32))
rng = np.random.default_rng(1)
s = jnp.asarray(rng.normal(size=(N, 8, 8)).astype(np.float32))
a_src = jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32))
a_dst = jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32))

for mode in ("revisit", "stream"):
    jax.clear_caches()  # bcsr_spmm's inner jit must re-trace under the flag
    bmod.BCSR_STREAM = mode == "stream"
    gmod.TILE_REVISIT = mode == "revisit"
    t = time_chained(lambda v, hh: hybrid_spmm_raw(hh, v), x, iters=12, reps=2, args=(g.hybrid,))
    log(mode=mode, op="hybrid_spmm", t_ms=t*1e3, edges_per_s=g.n_edges/t)
    t = time_chained(lambda v, gg, tt, s1, s2: gat_conv_hybrid(gg, tt, v, s1, s2),
                     s, iters=8, reps=2, args=(g, tiles_t, a_src, a_dst))
    log(mode=mode, op="gat_hybrid_fwd", t_ms=t*1e3)
    grad = jax.grad(lambda v, gg, tt, s1, s2: (gat_conv_hybrid(gg, tt, v, s1, s2) ** 2).sum())
    t = time_chained(lambda v, gg, tt, s1, s2: v - 1e-6*grad(v, gg, tt, s1, s2),
                     s, iters=8, reps=2, args=(g, tiles_t, a_src, a_dst))
    log(mode=mode, op="gat_hybrid_step", t_ms=t*1e3)
log(stage="done")
