"""Products-scale DISTRIBUTED convergence on the virtual 8-CPU mesh
(VERDICT r4 item 8).

r4 executed two distributed steps at 2.45M nodes (tools/products_dist_step);
this runs the real workload — the cached LP-ordered convergence DATASET
(community labels + class-signal features, tools/products_ds_cache.py) —
for a short early-stopped run so optimizer state, halo exchange, and eval
compose over many steps. Reports the loss/val trajectory as JSON lines.

Run (CPU-only, does not touch the TPU tunnel lease):
    nohup python tools/products_dist_converge.py > /tmp/products_dconv.log 2>&1 &
Needs /tmp/products_ds.npz.

Reference analog: the early-stopped epoch loop at reference
``pygcn/gnn-over-mlp.py:303-350`` — here full-batch over an 8-way
edge-partitioned graph with halo all_to_all instead of a single device.
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


def log(**kw):
    print(json.dumps(kw), flush=True)


P = 8
HIDDEN = 64
MAX_EPOCHS = 40
EVAL_EVERY = 4
PATIENCE = 3  # in eval rounds
MAX_WALL_S = 5400


def main():
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as PS

    from pygcn_tpu.graph.datasets import load_npz_dataset
    from pygcn_tpu.parallel import build_dist_plan, make_mesh
    from pygcn_tpu.parallel.dist_gcn import DistGCN, make_dist_classifier_step
    from pygcn_tpu.train import adam_l2

    t_start = time.time()
    data = load_npz_dataset(
        "/tmp/products_ds.npz", build_dense=False, build_bcsr=False,
        build_ell=False, build_hybrid=False, build_colpanel=False,
    )
    graph = data.graph
    n = graph.n_nodes
    feat = data.features.shape[1]
    n_classes = data.n_classes
    log(stage="loaded", n=n, e=int(graph.n_edges), feat=feat,
        n_classes=n_classes, host_s=time.time() - t_start)

    t0 = time.time()
    mesh = make_mesh([P], ["graph"])
    plan = build_dist_plan(graph, P)
    model = DistGCN(
        mesh, plan, [feat, HIDDEN, n_classes],
        final_activation=lambda h: jax.nn.log_softmax(h, axis=1),
    )
    log(stage="plan", host_s=time.time() - t0, shard_size=plan.shard_size,
        halo_rows_per_peer=int(plan.send_idx.shape[-1]))

    t0 = time.time()
    labels = np.asarray(data.labels)
    train_mask = np.zeros(n, np.float32)
    train_mask[np.asarray(data.idx_train)] = 1.0
    npad = plan.n_nodes_padded
    sh = NamedSharding(mesh, PS("graph"))
    labels_p = jax.device_put(
        jnp.zeros(npad, jnp.int32).at[:n].set(jnp.asarray(labels)), sh)
    mask_p = jax.device_put(
        jnp.zeros(npad, jnp.float32).at[:n].set(jnp.asarray(train_mask)), sh)
    params = model.shard_params(model.init(jax.random.key(0)))
    xs = model.shard_x(jnp.asarray(data.features))
    tx = adam_l2(0.01, 5e-4)
    opt_state = tx.init(params)
    step = make_dist_classifier_step(model, tx)
    fwd = jax.jit(model.apply)
    log(stage="model_placed", host_s=time.time() - t0)

    idx_val = np.asarray(data.idx_val)
    idx_test = np.asarray(data.idx_test)

    def accuracy(idx):
        lp = fwd(params, xs)  # [n_pad, C] sharded log-probs
        preds = np.asarray(lp[:n].argmax(axis=1))
        return float((preds[idx] == labels[idx]).mean())

    best_val, best_ep, test_at_best = 0.0, -1, float("nan")
    ep = 0
    while ep < MAX_EPOCHS and time.time() - t_start < MAX_WALL_S:
        t0 = time.time()
        params, opt_state, loss = step(params, opt_state, xs, labels_p, mask_p)
        l = float(loss)
        log(stage="epoch", ep=ep, loss=l, s=time.time() - t0)
        assert np.isfinite(l)
        if (ep + 1) % EVAL_EVERY == 0:
            t0 = time.time()
            va = accuracy(idx_val)
            log(stage="eval", ep=ep, val=va, s=time.time() - t0)
            if va > best_val:
                best_val, best_ep = va, ep
                test_at_best = accuracy(idx_test)
            elif ep - best_ep >= PATIENCE * EVAL_EVERY:
                log(stage="early_stop", ep=ep)
                break
        ep += 1
    log(stage="done", ok=True, epochs=ep + 1, best_val=best_val,
        test_at_best=test_at_best, best_ep=best_ep,
        wall_s=time.time() - t_start)


if __name__ == "__main__":
    main()
