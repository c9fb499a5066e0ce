"""Legacy per-sample GCN regressor trainer (reference ``pygcn/train.py``, E1).

Capability mirror of the superseded first-generation trainer: GCN backbone →
node-mean → MLP head on a single sample at a time, ``accumulation_step`` (20)
randomly resampled samples per epoch with gradient accumulation and ONE
optimizer step per epoch, MSE on total cases, splits truncated to 16 samples
(reference ``pygcn/train.py:117-119,134-204``). The accumulation loop becomes
one vmapped/jitted mean-gradient step.

Usage::

    python -m pygcn_tpu.apps.train_legacy --vac_result_path /tmp/vac.csv
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from pygcn_tpu.apps.common import build_synthetic_world
from pygcn_tpu.apps.train_evaluator import build_predictor_features
from pygcn_tpu.data.vac_results import load_vac_results
from pygcn_tpu.train import adam_l2
from pygcn_tpu.utils.logging import MetricsLogger


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--vac_result_path", required=True)
    ap.add_argument("--msa_name", default="SanFrancisco")
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--weight_decay", type=float, default=5e-4)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--accumulation_step", type=int, default=20)
    ap.add_argument("--truncate", type=int, default=16)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--n_cbgs", type=int, default=64)
    ap.add_argument("--n_pois", type=int, default=20)
    ap.add_argument("--hours", type=int, default=96)
    args = ap.parse_args(argv)

    from pygcn_tpu.apps.common import set_process_title

    set_process_title("train_legacy")

    import jax
    import jax.numpy as jnp
    import optax

    from pygcn_tpu.nn.models import GCNRegressor

    world = build_synthetic_world(
        n_cbgs=args.n_cbgs, n_pois=args.n_pois, hours=args.hours,
        msa_name=args.msa_name, seed=args.seed,
    )
    res = load_vac_results(args.vac_result_path, rel_result=True)
    feats = build_predictor_features(world, res)
    y = res.graph_labels[:, 0]
    y = ((y - y.mean()) / (y.std() + 1e-8)).astype(np.float32)

    # reference truncates each split to 16 samples (train.py:117-119)
    idx_train = res.idx_train[: args.truncate]
    idx_val = res.idx_val[: args.truncate]
    idx_test = res.idx_test[: args.truncate]

    model = GCNRegressor(
        gcn_nfeat=feats.shape[2], gcn_nhid=args.hidden, gcn_nclass=args.hidden,
        linear_nin=args.hidden, linear_nhid1=64, linear_nhid2=8, linear_nout=1,
    )
    params = model.init(jax.random.key(args.seed))
    tx = adam_l2(args.lr, args.weight_decay)
    opt_state = tx.init(params)
    graph = world.graph

    def sample_loss(params, xi, yi):
        return (model.apply(params, xi, graph)[0] - yi) ** 2

    @jax.jit
    def epoch_step(params, opt_state, xs, ys):
        # mean gradient over the resampled accumulation batch == the
        # reference's accumulated backward + single step
        def mean_loss(p):
            return jax.vmap(lambda xi, yi: sample_loss(p, xi, yi))(xs, ys).mean()

        loss, grads = jax.value_and_grad(mean_loss)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def split_loss(params, xs, ys):
        return jax.vmap(lambda xi, yi: sample_loss(params, xi, yi))(xs, ys).mean()

    rng = np.random.default_rng(args.seed)
    feats_j = jnp.asarray(feats)
    y_j = jnp.asarray(y)
    logger = MetricsLogger(None)
    for epoch in range(args.epochs):
        picks = rng.choice(idx_train, args.accumulation_step, replace=True)
        params, opt_state, loss = epoch_step(params, opt_state, feats_j[picks], y_j[picks])
        if epoch % 10 == 0:
            val = split_loss(params, feats_j[idx_val], y_j[idx_val])
            logger.log(epoch, train_loss=loss, val_loss=val)

    test = split_loss(params, feats_j[idx_test], y_j[idx_test])
    print(f"Test set results: loss= {float(test):.4f}")
    return float(test)


if __name__ == "__main__":
    main()
