"""Reddit-config chip numbers (VERDICT r2 #5).

Round 2's 216.7 ms/batch Reddit number mixed the ~45 ms tunnel dispatch
floor and host sampling into the per-batch cost. This isolates, on the real
TPU with everything device-resident and chained timing:

1. the DEVICE-ONLY fused train step at the Reddit config (602-d features,
   fanouts [25, 10], batch 1024) — sampling done ONCE host-side, batch put
   on device, step chained;
2. the layer-0 feature gather at 602-d (2.4 KB/row — 4-5x past the measured
   512 B/row knee) vs two mitigations: gathering 128-column SLICES of the
   same array, and gathering from a PRE-SPLIT tuple of [N, <=128] arrays
   (guaranteed-contiguous rows).

One JSON line per measurement. Run: nohup python tools/bench_reddit_r3.py
> /tmp/reddit_r3.log 2>&1 &
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np

N = 232_965
AVG_DEG = 489.0
FEAT = 602
CLASSES = 41
FANOUTS = (25, 10)
BATCH = 1024
HIDDEN = 128
ITERS = 16


def log(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from pygcn_tpu.graph.datasets import chung_lu_graph
    from pygcn_tpu.graph.transform import sym_normalize, symmetrize_max
    from pygcn_tpu.nn import init as tinit
    from pygcn_tpu.ops.sampling import (
        NeighborSampler, SampledBatch, sampled_gcn_forward,
    )
    from pygcn_tpu.utils.benchmark import time_chained

    cpu = jax.devices("cpu")[0]
    t0 = time.time()
    adj = sym_normalize(symmetrize_max(chung_lu_graph(N, AVG_DEG / 2, seed=0)))
    n_edges_total = int(adj.nnz)
    sampler = NeighborSampler(adj, FANOUTS, seed=0)
    rng = np.random.default_rng(0)
    seeds = rng.choice(N, BATCH, replace=False).astype(np.int32)
    t1 = time.time()
    batch = sampler.sample(seeds, pad=True)
    log(stage="built", n_edges=n_edges_total, host_graph_s=t1 - t0,
        host_sample_ms=(time.time() - t1) * 1e3,
        n_input=int(batch.input_nodes.size))

    x_full = jnp.asarray(rng.normal(size=(N, FEAT)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, CLASSES, BATCH).astype(np.int32))
    ids = jax.device_put(jnp.asarray(batch.input_nodes))
    blocks = jax.device_put(batch.blocks)
    x_full.block_until_ready()
    log(stage="x_on_device", mb=N * FEAT * 4 / 2**20)

    # --- gather variants -------------------------------------------------
    m = int(ids.size)

    def g_full(v, xf):
        out = jnp.take(xf, v, axis=0)
        return v + (out.sum() * 0).astype(v.dtype)

    t = time_chained(g_full, ids, iters=ITERS, reps=3, args=(x_full,))
    log(measurement="gather_full_602", t_ms=t * 1e3, rows=m,
        gb_per_s=m * FEAT * 4 / t / 1e9)

    def g_sliced(v, xf):
        outs = [
            jnp.take(jax.lax.slice_in_dim(xf, i, min(i + 128, FEAT), axis=1),
                     v, axis=0)
            for i in range(0, FEAT, 128)
        ]
        return v + (sum(o.sum() for o in outs) * 0).astype(v.dtype)

    t = time_chained(g_sliced, ids, iters=ITERS, reps=3, args=(x_full,))
    log(measurement="gather_sliced_128", t_ms=t * 1e3, rows=m,
        gb_per_s=m * FEAT * 4 / t / 1e9)

    x_split = tuple(
        jnp.asarray(np.asarray(x_full[:, i : i + 128]))
        for i in range(0, FEAT, 128)
    )
    jax.block_until_ready(x_split)

    def g_split(v, xs):
        outs = [jnp.take(c, v, axis=0) for c in xs]
        return v + (sum(o.sum() for o in outs) * 0).astype(v.dtype)

    t = time_chained(g_split, ids, iters=ITERS, reps=3, args=(x_split,))
    log(measurement="gather_presplit_128", t_ms=t * 1e3, rows=m,
        gb_per_s=m * FEAT * 4 / t / 1e9)

    # --- device-only fused train step ------------------------------------
    key = jax.random.key(0)
    dims = [FEAT, HIDDEN, CLASSES]
    params = []
    for fi, fo in zip(dims[:-1], dims[1:]):
        key, kw, kb = jax.random.split(key, 3)
        params.append({"w": tinit.graphconv_weight(kw, fi, fo),
                       "b": tinit.graphconv_bias(kb, fo)})
    params = jax.device_put(params)

    def make_step(gather):
        # time_chained chains ONE array: layer-0's weight carries the chain;
        # every other grad is folded in with a 0-weight term so the full
        # fwd+bwd is live.
        def loss_fn(p, blocks, v, xf, y):
            b = SampledBatch(blocks=blocks, input_nodes=None, output_nodes=None)
            logits = sampled_gcn_forward(p, b, gather(v, xf))
            logp = jax.nn.log_softmax(logits, axis=1)
            return -jnp.take_along_axis(logp, y[:, None], axis=1).mean()

        def chained(w0, rest, blocks, v, xf, y):
            p = [{"w": w0, "b": rest[0]["b"]}] + list(rest[1:])
            loss, grads = jax.value_and_grad(loss_fn)(p, blocks, v, xf, y)
            others = sum(jnp.sum(l) for l in jax.tree.leaves(grads[1:]))
            return w0 - 1e-6 * grads[0]["w"] + 0.0 * (others + loss)

        return chained

    w0 = params[0]["w"]
    t = time_chained(make_step(lambda v, xf: jnp.take(xf, v, axis=0)), w0,
                     iters=ITERS, reps=3, args=(params, blocks, ids, x_full, y))
    log(measurement="device_step_full_gather", t_ms=t * 1e3,
        seeds_per_s=BATCH / t)

    def gather_split(v, xs):
        return jnp.concatenate([jnp.take(c, v, axis=0) for c in xs], axis=1)

    t = time_chained(make_step(gather_split), w0,
                     iters=ITERS, reps=3, args=(params, blocks, ids, x_split, y))
    log(measurement="device_step_presplit_gather", t_ms=t * 1e3,
        seeds_per_s=BATCH / t)

    log(stage="done")


if __name__ == "__main__":
    main()
