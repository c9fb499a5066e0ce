"""GATv2 one-pass vs 3-pass, same session, arxiv power-law config."""
import json, sys
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np

def log(**kw): print(json.dumps(kw), flush=True)

import jax, jax.numpy as jnp
from pygcn_tpu.graph.datasets import chung_lu_graph
from pygcn_tpu.graph.graph import Graph
from pygcn_tpu.graph.transform import sym_normalize, symmetrize_max
from pygcn_tpu.ops.gat import build_edge_map, gatv2_conv_ell
from pygcn_tpu.utils.benchmark import time_chained

cpu = jax.devices("cpu")[0]
N = 169_343
adj = sym_normalize(symmetrize_max(chung_lu_graph(N, 7.1, seed=0)))
with jax.default_device(cpu):
    g = Graph.from_scipy(adj, is_symmetric=True, build_dense=False,
                         build_bcsr=False, build_ell=True)
    em = build_edge_map(g)
g, em = jax.device_put((g, em))
log(stage="built", n_edges=g.n_edges)

rng = np.random.default_rng(0)
s_l = jnp.asarray(rng.normal(size=(N, 8, 8)).astype(np.float32))
s_r = jnp.asarray(rng.normal(size=(N, 8, 8)).astype(np.float32))
a = jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32))

for stab in ("segmax", "flash"):
    fwd = lambda v, gg, ee, sr, aa, st=stab: gatv2_conv_ell(gg, ee, v, sr, aa, stabilizer=st)
    t = time_chained(fwd, s_l, iters=8, reps=2, args=(g, em, s_r, a))
    log(stab=stab, op="v2_fwd", t_ms=t*1e3)
    grad = jax.grad(lambda v, gg, ee, sr, aa, st=stab:
                    (gatv2_conv_ell(gg, ee, v, sr, aa, stabilizer=st) ** 2).sum())
    t = time_chained(lambda v, gg, ee, sr, aa: v - 1e-6*grad(v, gg, ee, sr, aa),
                     s_l, iters=8, reps=2, args=(g, em, s_r, a))
    log(stab=stab, op="v2_step", t_ms=t*1e3)
log(stage="done")
