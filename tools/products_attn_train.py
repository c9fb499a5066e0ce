"""Products-scale ATTENTION training via the two-program split step (r5).

The one-program GAT train step cannot fit the v5e's 15.75 GB HBM at
2.45M nodes (16.25-21.3 GB measured, PERF_NOTES r5) — so full-batch
attention TRAINING at this scale must be structured as separately jitted
programs with device-resident residuals. This tool demonstrates exactly
that, end-to-end to convergence, on the cached LP-ordered products
convergence dataset (/tmp/products_ds.npz, tools/products_ds_cache.py):

model: s = x @ W  ->  out = gat_v1(colpanel, s, a_src, a_dst)
       logits = elu(out).reshape(N, H*F) @ Wo + bo  ->  masked NLL

programs (each its own jit; nothing recompiles after epoch 1):
  P0 proj   : (x, W)                      -> s            [one GEMM]
  P1 attn_f : (cp, s, a1, a2)             -> (out, aux)   [12.58 GB pin]
  P2 head   : (out, Wo, bo, y, masks)     -> (loss, accs, dout, dWo, dbo)
  P3 attn_b : (cp, s, a1, a2, out, aux, dout) -> (ds, da1, da2)
  P4 proj_b : (x, ds)                     -> dW           [one GEMM]
  P5 adam   : params/opt update           [tiny buffers]

P2 evaluates train/val/test accuracy from the SAME out as the gradient
pass, so per-epoch eval is free. Adam state lives only on the small
parameters (W, a_src, a_dst, Wo, bo) — the big buffers (x, s, out, aux,
ds) are transient between programs.

Reference capability anchor: the sparse-engine training contract
(reference pygcn/layers.py:34 torch.spmm inside a trained layer; and the
full-batch loop gnn-over-mlp.py:303-350) extended to dynamic attention
weights at 36x the reference's production node count.

Usage: python tools/products_attn_train.py --max_wall_s 1200
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", default="/tmp/products_ds.npz")
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--pw", type=int, default=65536)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--patience", type=int, default=8)
    ap.add_argument("--eval_every", type=int, default=1)
    ap.add_argument("--max_wall_s", type=float, default=1200.0)
    ap.add_argument("--memstats", action="store_true",
                    help="AOT-pin the compiled HBM of P1/P3 before running")
    ap.add_argument("--cpu", action="store_true",
                    help="run on the CPU backend (smoke tests)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pygcn_tpu.graph.datasets import load_npz_dataset
    from pygcn_tpu.ops.colpanel import build_col_panel_ell
    from pygcn_tpu.ops.gat_colpanel import split_attention_step

    cpu = jax.devices("cpu")[0]
    t0 = time.time()
    with jax.default_device(cpu):
        data = load_npz_dataset(
            args.npz, build_dense=False, build_bcsr=False, build_ell=False,
            build_hybrid=False, build_colpanel=False)
    n, fin = data.features.shape
    c = data.n_classes
    coo = data.graph.to_scipy().tocsc()
    with jax.default_device(cpu):
        cp_host = build_col_panel_ell(coo, panel_width=args.pw)
    del coo
    gc.collect()
    log(stage="host_built", n=n, fin=fin, classes=c,
        n_edges=int(data.graph.n_edges), host_s=round(time.time() - t0, 1))

    # device residents: layout + features + labels + masks (x stays f32 —
    # fin=128 is 1.25 GB; the P1 program was pinned at 12.58 GB with
    # ~3 GB runtime headroom and x/s/out together add ~3.7 GB of
    # persistent buffers, so the union must be watched — memstats below)
    cp = jax.device_put(cp_host)
    del cp_host
    gc.collect()
    x = jnp.asarray(data.features)
    y = jnp.asarray(data.labels)
    masks = {}
    for name, idx in (("train", data.idx_train), ("val", data.idx_val),
                      ("test", data.idx_test)):
        m = np.zeros(n, np.float32)
        m[idx] = 1.0
        masks[name] = jnp.asarray(m)
    jax.block_until_ready(x)
    log(stage="device_resident", put_s=round(time.time() - t0, 1))

    h = args.heads
    f = 128 // h
    rng = np.random.default_rng(0)
    glorot = lambda *s: (rng.normal(size=s) *
                         np.sqrt(2.0 / (s[0] + s[-1]))).astype(np.float32)
    params = {
        "W": jnp.asarray(glorot(fin, h * f)),
        "a1": jnp.asarray(glorot(h, f) * 0.1),
        "a2": jnp.asarray(glorot(h, f) * 0.1),
        "Wo": jnp.asarray(glorot(h * f, c)),
        "bo": jnp.zeros((c,), jnp.float32),
    }

    fwd_raw, bwd_raw = split_attention_step(0.2)

    @jax.jit
    def p0_proj(x, W):
        return (x @ W).reshape(n, h, f)

    p1_attn_f = jax.jit(fwd_raw)

    @jax.jit
    def p2_head(out, Wo, bo, y, mtr, mva, mte):
        flat_elu = jax.nn.elu(out.reshape(n, h * f))

        def head_loss(flat, Wo, bo):
            logits = flat @ Wo + bo
            logp = jax.nn.log_softmax(logits, axis=1)
            nll = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
            loss = (nll * mtr).sum() / mtr.sum()
            hit = (jnp.argmax(logits, axis=1) == y).astype(jnp.float32)
            accs = jnp.stack([(hit * m).sum() / m.sum()
                              for m in (mtr, mva, mte)])
            return loss, accs

        loss, vjp, accs = jax.vjp(
            lambda fl, Wo, bo: head_loss(fl, Wo, bo), flat_elu, Wo, bo,
            has_aux=True)
        dflat, dWo, dbo = vjp(jnp.float32(1.0))
        # elu backward: d/dz elu(z) = 1 (z>0) else elu(z)+1
        dflat = dflat * jnp.where(flat_elu > 0, 1.0, flat_elu + 1.0)
        return loss, accs, dflat.reshape(n, h, f), dWo, dbo

    p3_attn_b = jax.jit(bwd_raw)

    @jax.jit
    def p4_proj_b(x, ds):
        return x.T @ ds.reshape(n, h * f)

    # torch-compatible Adam on the small parameters only
    import optax

    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def p5_adam(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    if args.memstats:
        from pygcn_tpu.utils.benchmark import memory_stats

        s_ref = p0_proj(x, params["W"])
        ms1 = memory_stats(p1_attn_f, cp, s_ref, params["a1"], params["a2"])
        log(stage="memstats_p1", total_gb=ms1["total_hbm_bytes"] / 2**30)
        out_ref, aux_ref = p1_attn_f(cp, s_ref, params["a1"], params["a2"])
        ms3 = memory_stats(p3_attn_b, cp, s_ref, params["a1"], params["a2"],
                           out_ref, aux_ref, out_ref)
        log(stage="memstats_p3", total_gb=ms3["total_hbm_bytes"] / 2**30)
        del s_ref, out_ref, aux_ref, ms1, ms3

    def epoch(params, opt_state):
        s = p0_proj(x, params["W"])
        out, aux = p1_attn_f(cp, s, params["a1"], params["a2"])
        loss, accs, dout, dWo, dbo = p2_head(
            out, params["Wo"], params["bo"], y,
            masks["train"], masks["val"], masks["test"])
        ds, da1, da2 = p3_attn_b(cp, s, params["a1"], params["a2"],
                                 out, aux, dout)
        dW = p4_proj_b(x, ds)
        grads = {"W": dW, "a1": da1, "a2": da2, "Wo": dWo, "bo": dbo}
        params, opt_state = p5_adam(params, opt_state, grads)
        return params, opt_state, loss, accs

    t_start = time.time()
    best_val, best_test, best_ep, bad = 0.0, 0.0, -1, 0
    ep_times = []
    for ep in range(args.epochs):
        t0 = time.time()
        params, opt_state, loss, accs = epoch(params, opt_state)
        accs = np.asarray(accs)  # materializes the chain
        dt = time.time() - t0
        ep_times.append(dt)
        log(epoch=ep, loss=round(float(loss), 4),
            train=round(float(accs[0]), 4), val=round(float(accs[1]), 4),
            test=round(float(accs[2]), 4), s=round(dt, 1))
        if accs[1] > best_val:
            best_val, best_test, best_ep, bad = accs[1], accs[2], ep, 0
        else:
            bad += 1
            if bad >= args.patience:
                log(stage="early_stop", epoch=ep)
                break
        if time.time() - t_start > args.max_wall_s:
            log(stage="wall_stop", epoch=ep)
            break
    steady = sorted(ep_times[1:])[:max(1, (len(ep_times) - 1) // 2)]
    log(stage="result", best_val=round(float(best_val), 4),
        best_test=round(float(best_test), 4), best_epoch=best_ep,
        epochs_run=len(ep_times),
        compile_plus_first_s=round(ep_times[0], 1),
        median_fast_epoch_s=round(float(np.median(steady)), 2),
        total_wall_s=round(time.time() - t_start, 1))
    log(stage="done")


if __name__ == "__main__":
    main()
