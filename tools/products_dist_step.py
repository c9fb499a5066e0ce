"""ONE distributed training step at ogbn-products scale on the virtual
8-CPU mesh (VERDICT r3 item 3b).

r3 validated the products halo PLANS as host-built byte models
(HALO_REPORT_products.json) but never executed a distributed step at that
scale — plan/layout/memory integration at 2.45M nodes / 63.4M edges was
unproven. This runs the real thing end-to-end on the CPU mesh: partition
the cached LP-ordered graph over P shards, build the halo-exchange
DistGCN, execute one fused train step (fwd + bwd + Adam with the
all_to_all halo and its reverse-halo VJP), and report wall times + the
plan's shape numbers.

Run (CPU-only, does not touch the TPU):
    nohup python tools/products_dist_step.py > /tmp/products_dist.log 2>&1 &
Needs /tmp/products_lp.npz (tools/products_cache.py).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import scipy.sparse as sp


def log(**kw):
    print(json.dumps(kw), flush=True)


P = 8
H = 64  # hidden width (feature dim below keeps host memory sane)
FEAT = 64
N_CLASSES = 40


def main():
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as PS

    from pygcn_tpu.graph.graph import Graph
    from pygcn_tpu.parallel import build_dist_plan, make_mesh
    from pygcn_tpu.parallel.dist_gcn import DistGCN, make_dist_classifier_step
    from pygcn_tpu.train import adam_l2

    t0 = time.time()
    z = np.load("/tmp/products_lp.npz")
    n = int(z["n"])
    row, col, data = z["row"], z["col"], z["data"]
    log(stage="loaded", n=n, e=int(row.size), host_s=time.time() - t0)

    t0 = time.time()
    graph = Graph.from_coo(
        col, row, data, n_nodes=n, is_symmetric=True,
        build_dense=False, build_bcsr=False, build_ell=False,
        build_hybrid=False, build_colpanel=False,
    )
    log(stage="graph", host_s=time.time() - t0)

    t0 = time.time()
    mesh = make_mesh([P], ["graph"])
    plan = build_dist_plan(graph, P)
    log(stage="plan", host_s=time.time() - t0, shard_size=plan.shard_size,
        halo_rows_per_peer=int(plan.send_idx.shape[-1]))

    t0 = time.time()
    model = DistGCN(
        mesh, plan, [FEAT, H, N_CLASSES],
        final_activation=lambda h: jax.nn.log_softmax(h, axis=1),
    )
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, FEAT)).astype(np.float32)
    labels = rng.integers(0, N_CLASSES, n).astype(np.int32)
    mask = (rng.uniform(size=n) < 0.05).astype(np.float32)
    params = model.shard_params(model.init(jax.random.key(0)))
    xs = model.shard_x(jnp.asarray(x))
    npad = plan.n_nodes_padded
    sh = NamedSharding(mesh, PS("graph"))
    labels_p = jax.device_put(
        jnp.zeros(npad, jnp.int32).at[:n].set(jnp.asarray(labels)), sh)
    mask_p = jax.device_put(
        jnp.zeros(npad, jnp.float32).at[:n].set(jnp.asarray(mask)), sh)
    tx = adam_l2(0.01, 5e-4)
    opt_state = tx.init(params)
    step = make_dist_classifier_step(model, tx)
    log(stage="model_placed", host_s=time.time() - t0)

    t0 = time.time()
    params, opt_state, loss = step(params, opt_state, xs, labels_p, mask_p)
    l0 = float(loss)
    log(stage="step1_compile_and_run", loss=l0, s=time.time() - t0)
    assert np.isfinite(l0)

    t0 = time.time()
    params, opt_state, loss = step(params, opt_state, xs, labels_p, mask_p)
    l1 = float(loss)
    log(stage="step2_steady", loss=l1, s=time.time() - t0)
    assert np.isfinite(l1) and l1 < l0 * 1.5
    log(stage="done", ok=True)


if __name__ == "__main__":
    main()
