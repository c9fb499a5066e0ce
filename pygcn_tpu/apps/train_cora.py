"""Full-batch semi-supervised node classification (the Kipf GCN workload).

The BASELINE Cora configuration: 2-layer GCN, hidden 16, dropout 0.5, Adam
lr 0.01 wd 5e-4, NLL over log_softmax, splits 140/300/1000 — the preprocessing
follows the reference's (disabled) Cora path at ``pygcn/utils.py:343-383``.
Runs on real Planetoid files when present (``cora.content``/``cora.cites``),
else on a synthetic SBM stand-in (the reference repo's ``cora.content`` is a
missing blob).

Usage::

    python -m pygcn_tpu.apps.train_cora --data_dir data/cora --epochs 200
"""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_dir", default="data/cora")
    ap.add_argument("--dataset", default="cora")
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--weight_decay", type=float, default=5e-4)
    ap.add_argument("--hidden", type=int, default=16)
    ap.add_argument("--dropout", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--adj_norm", choices=["sym", "row"], default="sym")
    ap.add_argument("--patience", type=int, default=0, help="0 = no early stop")
    ap.add_argument("--fastmode", action="store_true")
    ap.add_argument("--synthetic_nodes", type=int, default=1500)
    args = ap.parse_args(argv)

    from pygcn_tpu.apps.common import set_process_title

    set_process_title("train_cora")

    import jax
    import jax.numpy as jnp

    from pygcn_tpu.graph.datasets import (
        load_planetoid,
        load_planetoid_structure,
        sbm_classification,
    )
    from pygcn_tpu.nn.models import KipfGCN
    from pygcn_tpu.train import EarlyStopping, adam_l2
    from pygcn_tpu.train.loop import bool_mask, make_classifier_steps

    content = os.path.join(args.data_dir, f"{args.dataset}.content")
    cites = os.path.join(args.data_dir, f"{args.dataset}.cites")
    if os.path.exists(content) and os.path.exists(cites):
        data = load_planetoid(content, cites, adj_norm=args.adj_norm)
        print(f"loaded {args.dataset}: {data.graph.n_nodes} nodes, "
              f"{data.graph.n_edges} edges, {data.n_classes} classes")
    elif os.path.exists(cites):
        # real citation structure, but the .content blob (features/labels) is
        # missing — train on the true graph with SYNTHETIC features/labels
        # (accuracy not comparable to real-Cora results)
        data = load_planetoid_structure(cites, seed=args.seed, adj_norm=args.adj_norm)
        print(f"loaded {args.dataset} STRUCTURE ({data.graph.n_nodes} nodes, "
              f"{data.graph.n_edges} normalized edges) — {content} missing, "
              "features/labels are synthetic")
    else:
        print(f"{content} not found — using synthetic SBM stand-in")
        data = sbm_classification(
            n=args.synthetic_nodes, n_classes=7, feat_dim=256, seed=args.seed,
            adj_norm=args.adj_norm,
        )

    model = KipfGCN(
        nfeat=data.features.shape[1], nhid=args.hidden,
        nclass=data.n_classes, dropout=args.dropout,
    )
    params = model.init(jax.random.key(args.seed))
    tx = adam_l2(args.lr, args.weight_decay)
    opt_state = tx.init(params)
    train_step, eval_step = make_classifier_steps(model, tx, data.graph)

    x = jnp.asarray(data.features)
    y = jnp.asarray(data.labels)
    n = data.graph.n_nodes
    m_train = bool_mask(data.idx_train, n)
    m_val = bool_mask(data.idx_val, n)
    m_test = bool_mask(data.idx_test, n)

    stopper = EarlyStopping(patience=args.patience) if args.patience else None
    rng = jax.random.key(args.seed)
    t0 = time.time()
    for epoch in range(args.epochs):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = train_step(params, opt_state, x, y, m_train, sub)
        if not args.fastmode and (epoch % 10 == 9 or epoch == 0):
            val_loss, val_acc = eval_step(params, x, y, m_val)
            print(f"epoch {epoch + 1:4d} loss {float(loss):.4f} "
                  f"val_loss {float(val_loss):.4f} val_acc {float(val_acc):.4f}")
            if stopper and stopper(float(val_loss)):
                print("Early stopping")
                break
    print(f"Optimization Finished! {time.time() - t0:.2f}s")

    test_loss, test_acc = eval_step(params, x, y, m_test)
    print(f"Test set results: loss= {float(test_loss):.4f} "
          f"accuracy= {float(test_acc):.4f}")
    return float(test_acc)


if __name__ == "__main__":
    main()
