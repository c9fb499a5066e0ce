"""Surrogate-evaluator trainer (the reference's main ``gnn-over-mlp.py``, E2).

Pipeline: gt CSV(s) → predictor node features (standardized demographics +
embeddings + per-sample vac flags) → centrality features → 4-mode assembly →
GCN_OVER_MLP, trained with Adam+L2, grad-clip 0.1, ReduceLROnPlateau('max' on
val Spearman, factor 0.5, patience 8), EarlyStopping(30), dual checkpoints
(min-val-loss and max-Spearman), ``--resume``, MSE + Spearman metrics —
mirroring reference ``pygcn/gnn-over-mlp.py:300-432``. The training step is a
single jitted fused forward/backward/update; the evaluator batch dimension is
vmapped (no per-sample Python loop).

Usage::

    python -m pygcn_tpu.apps.train_evaluator --synthetic \
        --vac_result_path /tmp/vac.csv --epochs 50 --out_dir /tmp/eval_run
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

from pygcn_tpu.data.features import (
    assemble_evaluator_features,
    centrality_features,
    standardize,
)
from pygcn_tpu.data.loader import make_split_loaders
from pygcn_tpu.data.vac_results import load_vac_results
from pygcn_tpu.apps.common import build_synthetic_world
from pygcn_tpu.train import (
    EarlyStopping,
    PreemptionGuard,
    ReduceLROnPlateau,
    adam_l2,
    load_checkpoint,
    save_checkpoint_state,
)
from pygcn_tpu.utils.logging import MetricsLogger


def build_predictor_features(world, res) -> np.ndarray:
    """[B, N, 4 demo + E embed + 1 flag] (reference ``pygcn/utils.py:280-311``)."""
    demo = standardize(world.demographics)
    embed = standardize(world.embeddings)
    b = res.num_samples
    n = world.n_cbgs
    f = 4 + embed.shape[1] + 1
    feats = np.zeros((b, n, f), np.float32)
    feats[:, :, :4] = demo
    feats[:, :, 4:-1] = embed
    for i, tags in enumerate(res.vac_tags):
        feats[i, tags, -1] = 1.0
    return feats


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--vac_result_path", required=True)
    ap.add_argument("--synthetic", action="store_true", default=True)
    ap.add_argument("--msa_name", default="SanFrancisco")
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--weight_decay", type=float, default=5e-4)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--batch_size", type=int, default=20)
    ap.add_argument("--NN", type=int, default=5)
    ap.add_argument("--target_code", type=int, default=0, choices=[0, 1],
                    help="0=total_cases, 1=case_std")
    ap.add_argument("--with_pretrained_embed", action="store_true", default=True)
    ap.add_argument("--with_original_feat", action="store_true")
    ap.add_argument("--rel_result", action="store_true", default=True)
    ap.add_argument("--quicktest", action="store_true")
    ap.add_argument("--kfold", type=int, default=0,
                    help="k-fold CV over train+val (the reference's commented "
                         "scaffold at gnn-over-mlp.py:434-480); 0 = off")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--world_seed", type=int, default=None,
                    help="synthetic-world seed (default: --seed). Set this "
                         "to the gt CSV's world seed when varying --seed for "
                         "model-init variance — the world must stay matched "
                         "to the ground truth")
    ap.add_argument("--n_cbgs", type=int, default=64)
    ap.add_argument("--n_pois", type=int, default=20)
    ap.add_argument("--hours", type=int, default=96)
    ap.add_argument("--patience", type=int, default=30)
    ap.add_argument("--grad_clip", type=float, default=0.1)
    ap.add_argument("--bf16", action="store_true",
                    help="mixed precision: bf16 compute (params/activations/"
                         "adjacency cast inside the step), f32 master params, "
                         "loss, and updates — measured 1.23x on the fused "
                         "train step at reference scale (v5e)")
    ap.add_argument("--data_parallel", action="store_true",
                    help="shard the policy-sample batch axis over all devices "
                         "(params replicated; XLA inserts the gradient "
                         "all-reduce)")
    ap.add_argument("--out_dir", required=True)
    args = ap.parse_args(argv)

    from pygcn_tpu.apps.common import set_process_title

    set_process_title("train_evaluator")

    import jax
    import jax.numpy as jnp
    import optax

    from pygcn_tpu.nn.models import GCNOverMLP
    from pygcn_tpu.train.metrics import spearman

    os.makedirs(args.out_dir, exist_ok=True)

    if not os.path.exists(args.vac_result_path):
        print("gt CSV missing — generating synthetic ground truth first")
        from pygcn_tpu.apps import gt_gen

        gt_gen.main([
            "--out", args.vac_result_path, "--num_samples", "48",
            "--NN", str(args.NN), "--n_cbgs", str(args.n_cbgs),
            "--hours", str(args.hours), "--num_seeds", "4",
        ])

    world = build_synthetic_world(
        n_cbgs=args.n_cbgs, n_pois=args.n_pois, hours=args.hours,
        msa_name=args.msa_name,
        seed=args.seed if args.world_seed is None else args.world_seed,
    )
    res = load_vac_results(args.vac_result_path, rel_result=args.rel_result)
    node_feats = build_predictor_features(world, res)
    cent = centrality_features(world.adj)
    feats, dim_touched = assemble_evaluator_features(
        node_feats, cent, args.with_pretrained_embed, args.with_original_feat
    )
    y = res.graph_labels[:, args.target_code]
    # standardize the target for stable MSE scale
    y = ((y - y.mean()) / (y.std() + 1e-8)).astype(np.float32)

    train_loader, val_loader, test_loader = make_split_loaders(
        feats, y, res.idx_train, res.idx_val, res.idx_test,
        args.batch_size, quicktest=args.quicktest, seed=args.seed,
    )

    gcn_nclass = args.hidden
    f_total = feats.shape[2]
    model = GCNOverMLP(
        gcn_nfeat=dim_touched, gcn_nhid=args.hidden, gcn_nclass=gcn_nclass,
        dim_touched=dim_touched,
        linear_nin=gcn_nclass + (f_total - dim_touched) - 1,
        linear_nhid1=64, linear_nhid2=8, linear_nout=1,
    )
    params = model.init(jax.random.key(args.seed))
    shard_batch = lambda b: b
    if args.data_parallel:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from pygcn_tpu.parallel import make_mesh

        n_dev = len(jax.devices())
        if args.batch_size % n_dev:
            raise SystemExit(
                f"--data_parallel needs batch_size divisible by {n_dev} devices"
            )
        train_loader.drop_last = True  # keep shard shapes uniform
        mesh = make_mesh([n_dev], ["data"])
        batch_sharding = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        params = jax.device_put(params, repl)
        shard_batch = lambda b: jax.device_put(b, batch_sharding)
    tx = adam_l2(args.lr, args.weight_decay, grad_clip_norm=args.grad_clip)
    opt_state = tx.init(params)
    sched = ReduceLROnPlateau(mode="max", factor=0.5, patience=8, min_lr=1e-8)
    stopper = EarlyStopping(patience=args.patience)
    graph = world.graph

    # all samples stay device-resident; jitted steps receive INDICES, so no
    # per-step host->device batch transfer (through the remote tunnel that
    # transfer dominated the step time at reference scale)
    feats_dev = jnp.asarray(feats)
    y_dev = jnp.asarray(y)

    # mixed precision: master params stay f32 (grads flow back through the
    # cast), compute runs bf16 on the MXU, loss/updates stay f32
    compute_graph = graph
    if args.bf16 and graph.dense is not None:
        import dataclasses

        compute_graph = dataclasses.replace(
            graph, dense=graph.dense.astype(jnp.bfloat16)
        )

    def loss_fn(params, bx, by):
        if args.bf16:
            params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
            bx = bx.astype(jnp.bfloat16)
        pred = model.apply(params, bx, compute_graph)[:, 0].astype(jnp.float32)
        return jnp.mean((pred - by) ** 2)

    @jax.jit
    def train_step_idx(params, opt_state, feats_all, y_all, idx):
        bx = jnp.take(feats_all, idx, axis=0)
        by = jnp.take(y_all, idx, axis=0)
        loss, grads = jax.value_and_grad(loss_fn)(params, bx, by)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def train_step(params, opt_state, bx, by):
        loss, grads = jax.value_and_grad(loss_fn)(params, bx, by)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def predict(params, bx):
        return model.apply(params, bx, graph)[:, 0]

    def evaluate(loader, eval_params=None):
        eval_params = params if eval_params is None else eval_params
        losses, preds, truths = [], [], []
        for bx, by in loader:
            p = predict(eval_params, jnp.asarray(bx))
            losses.append(float(jnp.mean((p - jnp.asarray(by)) ** 2)))
            preds.append(np.asarray(p))
            truths.append(by)
        preds, truths = np.concatenate(preds), np.concatenate(truths)
        corr = float(spearman(jnp.asarray(preds), jnp.asarray(truths)))
        return float(np.mean(losses)), corr

    if args.kfold > 0:
        from pygcn_tpu.data.loader import ArrayLoader, kfold_splits

        tv_idx = np.concatenate([res.idx_train, res.idx_val])
        fold_metrics = []
        for fold, (tr, va) in enumerate(kfold_splits(len(tv_idx), args.kfold, args.seed)):
            fparams = model.init(jax.random.key(args.seed + fold))
            fopt = tx.init(fparams)
            tr_loader = ArrayLoader(
                [feats[tv_idx[tr]], y[tv_idx[tr]]], args.batch_size, shuffle=True,
                seed=args.seed,
            )
            va_loader = ArrayLoader([feats[tv_idx[va]], y[tv_idx[va]]], args.batch_size)
            for _ in range(args.epochs):
                for bx, by in tr_loader:
                    fparams, fopt, _ = train_step(
                        fparams, fopt, jnp.asarray(bx), jnp.asarray(by)
                    )
            vl, vc = evaluate(va_loader, fparams)
            fold_metrics.append((vl, vc))
            print(f"fold {fold}: val_loss={vl:.4f} val_spearman={vc:.4f}")
        mean_loss = float(np.mean([m[0] for m in fold_metrics]))
        mean_corr = float(np.mean([m[1] for m in fold_metrics]))
        print(f"kfold mean: val_loss={mean_loss:.4f} val_spearman={mean_corr:.4f}")
        return mean_loss, mean_corr

    ckpt_minloss = os.path.join(args.out_dir, "checkpoint_minloss.pkl")
    ckpt_maxcorr = os.path.join(args.out_dir, "checkpoint_maxcorr.pkl")
    ckpt_last = os.path.join(args.out_dir, "checkpoint_last.pkl")
    start_epoch = 0
    min_val_loss, max_val_corr = np.inf, -np.inf
    # --resume prefers the preemption checkpoint (exact training state incl.
    # best-metric watermarks + early-stop counters) over the best-metric one
    resume_path = next(
        (p for p in (ckpt_last, ckpt_maxcorr)
         if args.resume and os.path.exists(p)), None,
    )
    if resume_path is not None:
        payload = load_checkpoint(resume_path)
        params = jax.tree.map(jnp.asarray, payload["params"])
        opt_state = jax.tree.map(jnp.asarray, payload["opt_state"])
        start_epoch = payload["epoch"]
        sched.load_state_dict(payload["scheduler_state"])
        extra = payload.get("extra")
        if extra is not None:  # preemption checkpoint: exact loop state
            min_val_loss = float(extra["min_val_loss"])
            max_val_corr = float(extra["max_val_corr"])
            stopper.load_state_dict(extra["stopper"])
        else:
            # best-metric checkpoint carries no watermarks: seed them from one
            # eval so the first resumed epoch can't overwrite a better model
            min_val_loss, max_val_corr = evaluate(val_loader)
        print(f"resumed from epoch {start_epoch} ({os.path.basename(resume_path)})")

    logger = MetricsLogger(os.path.join(args.out_dir, "metrics.jsonl"))
    idx_order = np.asarray(res.idx_train)
    n_batches = max(1, len(idx_order) // args.batch_size)
    with PreemptionGuard() as guard:
        for epoch in range(start_epoch, start_epoch + args.epochs):
            train_losses = []
            if args.data_parallel or args.quicktest:
                # keep the loader path for sharded/shrunken batches
                for bx, by in train_loader:
                    params, opt_state, loss = train_step(
                        params, opt_state, shard_batch(jnp.asarray(bx)), shard_batch(jnp.asarray(by))
                    )
                    train_losses.append(float(loss))
            else:
                # per-epoch seeded shuffle: a resumed run replays the exact
                # order an uninterrupted run would have used at this epoch
                np.random.default_rng([args.seed, epoch]).shuffle(idx_order)
                losses_dev = []
                for b in range(n_batches):
                    idx = jnp.asarray(idx_order[b * args.batch_size : (b + 1) * args.batch_size])
                    if idx.shape[0] < args.batch_size:
                        continue
                    params, opt_state, loss = train_step_idx(
                        params, opt_state, feats_dev, y_dev, idx
                    )
                    losses_dev.append(loss)
                train_losses = [float(l) for l in losses_dev]  # one sync per epoch
            val_loss, val_corr = evaluate(val_loader)
            logger.log(epoch, train_loss=np.mean(train_losses), val_loss=val_loss,
                       val_spearman=val_corr)

            if val_loss < min_val_loss:
                min_val_loss = val_loss
                save_checkpoint_state(params, epoch, opt_state, sched.state_dict(), ckpt_minloss)
            if val_corr > max_val_corr:
                max_val_corr = val_corr
                save_checkpoint_state(params, epoch, opt_state, sched.state_dict(), ckpt_maxcorr)
            opt_state, _ = sched.step(max_val_corr, opt_state)
            if guard.requested:
                # preemption: persist the EXACT loop state (next epoch, sched,
                # best-metric watermarks, early-stop counters) in the explicit
                # `extra` slot and exit cleanly for a --resume rerun
                save_checkpoint_state(
                    params, epoch + 1, opt_state, sched.state_dict(), ckpt_last,
                    extra={"min_val_loss": min_val_loss,
                           "max_val_corr": max_val_corr,
                           "stopper": stopper.state_dict()},
                )
                logger.close()
                print(f"preempted at epoch {epoch}: saved {ckpt_last}; "
                      "rerun with --resume to continue")
                return None
            if stopper(val_loss):
                print("Early stopping")
                break

    test_loss, test_corr = evaluate(test_loader)
    print(f"test loss: {test_loss}")
    print(f"Spearman correlation: {test_corr}")

    # the run completed: drop the preemption checkpoint so a supervisor's
    # redundant `--resume` relaunch can't rewind to a stale mid-run epoch
    if os.path.exists(ckpt_last):
        os.remove(ckpt_last)

    # whole-model handoff for the policy scripts (reference gnn-over-mlp.py:489)
    with open(os.path.join(args.out_dir, "evaluator.pkl"), "wb") as f:
        pickle.dump(
            {
                "model_config": {k: getattr(model, k) for k in (
                    "gcn_nfeat", "gcn_nhid", "gcn_nclass", "dim_touched",
                    "linear_nin", "linear_nhid1", "linear_nhid2", "linear_nout")},
                "params": jax.tree.map(np.asarray, params),
                "dim_touched": dim_touched,
                "feature_mode": {
                    "with_pretrained_embed": args.with_pretrained_embed,
                    "with_original_feat": args.with_original_feat,
                },
                "test_loss": test_loss,
                "test_spearman": test_corr,
            },
            f,
        )
    logger.close()
    return test_loss, test_corr


if __name__ == "__main__":
    main()
