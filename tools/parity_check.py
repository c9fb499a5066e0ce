"""Per-layer activation parity check vs reference PyTorch GCN math.

Implements the BASELINE requirement "per-layer activations allclose vs
reference PyTorch GCN on Cora": builds identical parameters in both stacks,
runs real Cora when ``data/cora/cora.content`` exists (the reference repo's
copy is a missing blob) else a synthetic stand-in, and prints max deviations
per layer plus final accuracy agreement.

Usage::

    PYTHONPATH=. python tools/parity_check.py [--data_dir data/cora]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_dir", default="data/cora")
    ap.add_argument("--hidden", type=int, default=16)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    import jax.numpy as jnp
    import numpy as np
    import torch
    import torch.nn.functional as F

    from pygcn_tpu.graph.datasets import load_planetoid, sbm_classification
    from pygcn_tpu.nn.models import KipfGCN

    torch.set_num_threads(1)

    content = os.path.join(args.data_dir, "cora.content")
    cites = os.path.join(args.data_dir, "cora.cites")
    if os.path.exists(content):
        data = load_planetoid(content, cites)
        print(f"dataset: Cora ({data.graph.n_nodes} nodes)")
    else:
        data = sbm_classification(n=1000, n_classes=7, feat_dim=256, seed=args.seed)
        print("dataset: synthetic SBM stand-in (cora.content is a missing blob "
              "in the reference repo)")

    model = KipfGCN(
        nfeat=data.features.shape[1], nhid=args.hidden, nclass=data.n_classes, dropout=0.0
    )
    params = model.init(jax.random.key(args.seed))
    x = jnp.asarray(data.features)
    adj_t = torch.tensor(np.asarray(data.graph.dense), dtype=torch.float32)
    xt = torch.tensor(data.features)

    def torch_layer(h, p):
        support = torch.mm(h, torch.tensor(np.asarray(p["w"])))
        return torch.spmm(adj_t, support) + torch.tensor(np.asarray(p["b"]))

    # layer 1
    ours1 = jnp.dot(x, params["gc1"]["w"])
    from pygcn_tpu.ops.spmm import spmm

    ours1 = spmm(data.graph, ours1) + params["gc1"]["b"]
    theirs1 = torch_layer(xt, params["gc1"])
    d1 = np.abs(np.asarray(ours1) - theirs1.detach().numpy()).max()

    ours1a = jax.nn.relu(ours1)
    theirs1a = F.relu(theirs1)

    # layer 2
    ours2 = spmm(data.graph, jnp.dot(ours1a, params["gc2"]["w"])) + params["gc2"]["b"]
    theirs2 = torch_layer(theirs1a, params["gc2"])
    d2 = np.abs(np.asarray(ours2) - theirs2.detach().numpy()).max()

    ours_out = jax.nn.log_softmax(ours2, axis=1)
    theirs_out = F.log_softmax(theirs2, dim=1)
    d3 = np.abs(np.asarray(ours_out) - theirs_out.detach().numpy()).max()

    full = model.apply(params, x, data.graph)
    d4 = np.abs(np.asarray(full) - theirs_out.detach().numpy()).max()

    agree = (
        np.asarray(full).argmax(1) == theirs_out.detach().numpy().argmax(1)
    ).mean()
    print(f"layer1 (A(XW)+b)      max |Δ| = {d1:.3e}")
    print(f"layer2                max |Δ| = {d2:.3e}")
    print(f"log_softmax           max |Δ| = {d3:.3e}")
    print(f"full model.apply      max |Δ| = {d4:.3e}")
    print(f"argmax agreement: {agree * 100:.2f}%")
    ok = d4 < 1e-4 and agree == 1.0
    print("PARITY OK" if ok else "PARITY FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
