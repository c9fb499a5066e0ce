"""Batch inference / serving CLI for a trained surrogate evaluator.

The reference has no serving path — its trained ``.pt`` is unpickled inside
each policy script (``policy-generator.py:271-273``). This app is the
production counterpart: load ``evaluator.pkl`` once, pin weights and the
co-visitation graph on device, compile ONE fixed-batch-shape forward, and
stream policy batches through it (pad-and-trim, so no shape ever recompiles).

Two artifact modes:

- default: run from ``evaluator.pkl`` (params + model config);
- ``--export out.shlo`` additionally writes a ``jax.export`` StableHLO
  artifact (weights + graph baked in), and ``--from_export in.shlo`` serves
  from such an artifact with NO model code in the loop.

Input policies: ``--policies_csv`` (a gt-format CSV's ``Vaccinated_Idxs``
column) or ``--random K``. Output: CSV of ``Vaccinated_Idxs, Prediction``
plus per-batch latency stats (compile excluded).

Usage::

    python -m pygcn_tpu.apps.predict --evaluator /tmp/eval/evaluator.pkl \
        --random 100 --out /tmp/preds.csv
"""

from __future__ import annotations

import argparse
import ast
import csv
import pickle
import time

import numpy as np

from pygcn_tpu.apps.common import build_synthetic_world
from pygcn_tpu.data.features import (
    assemble_evaluator_features,
    centrality_features,
    standardize,
)


def _policy_features(world, policies, feature_mode):
    """[B, N, F] evaluator inputs for a list of vaccinated-idx tuples."""
    n = world.n_cbgs
    b = len(policies)
    demo = standardize(world.demographics)
    embed = standardize(world.embeddings)
    node_feats = np.zeros((b, n, 4 + embed.shape[1] + 1), np.float32)
    node_feats[:, :, :4] = demo
    node_feats[:, :, 4:-1] = embed
    for i, p in enumerate(policies):
        node_feats[i, list(p), -1] = 1.0
    cent = centrality_features(world.adj)
    feats, _ = assemble_evaluator_features(
        node_feats, cent,
        feature_mode["with_pretrained_embed"], feature_mode["with_original_feat"],
    )
    return feats


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--evaluator", default=None, help="evaluator.pkl from train_evaluator")
    ap.add_argument("--from_export", default=None,
                    help="serve from a jax.export artifact instead of the pickle")
    ap.add_argument("--export", default=None,
                    help="also write a StableHLO serving artifact here")
    ap.add_argument("--policies_csv", default=None,
                    help="gt-format CSV; predicts for its Vaccinated_Idxs column")
    ap.add_argument("--random", type=int, default=0, help="predict for K random policies")
    ap.add_argument("--NN", type=int, default=5)
    ap.add_argument("--batch", type=int, default=32, help="fixed serving batch shape")
    ap.add_argument("--msa_name", default="SanFrancisco")
    ap.add_argument("--n_cbgs", type=int, default=64)
    ap.add_argument("--n_pois", type=int, default=20)
    ap.add_argument("--hours", type=int, default=48)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)
    if not args.evaluator and not args.from_export:
        ap.error("need --evaluator or --from_export")

    from pygcn_tpu.apps.common import set_process_title

    set_process_title("predict")

    import jax
    import jax.numpy as jnp

    world = build_synthetic_world(
        n_cbgs=args.n_cbgs, n_pois=args.n_pois, hours=args.hours,
        msa_name=args.msa_name, seed=args.seed,
    )

    # --- assemble the request stream -------------------------------------
    policies = []
    if args.policies_csv:
        with open(args.policies_csv) as f:
            for row in csv.DictReader(f):
                policies.append(tuple(ast.literal_eval(row["Vaccinated_Idxs"])))
    rng = np.random.default_rng(args.seed)
    for _ in range(args.random):
        policies.append(tuple(sorted(rng.choice(world.n_cbgs, args.NN, replace=False))))
    if not policies:
        raise SystemExit("no policies: pass --policies_csv and/or --random K")

    # --- build the fixed-shape forward ------------------------------------
    if args.from_export:
        from pygcn_tpu.train.export import load_artifact

        predict_batch, meta = load_artifact(args.from_export)
        feature_mode = meta["feature_mode"]
        batch = meta["batch"]
        if meta["n_cbgs"] != world.n_cbgs:
            raise SystemExit(
                f"artifact was exported for n_cbgs={meta['n_cbgs']}, world has {world.n_cbgs}"
            )
    else:
        from pygcn_tpu.nn.models import GCNOverMLP

        with open(args.evaluator, "rb") as f:
            ev = pickle.load(f)
        model = GCNOverMLP(**ev["model_config"])
        params = jax.tree.map(jnp.asarray, ev["params"])
        feature_mode = ev.get(
            "feature_mode",
            {"with_pretrained_embed": True, "with_original_feat": False},
        )
        batch = args.batch
        graph = world.graph

        @jax.jit
        def predict_batch(bx):
            return model.apply(params, bx, graph)[:, 0]

    # --- serve -------------------------------------------------------------
    feats = _policy_features(world, policies, feature_mode)
    if args.export:
        from pygcn_tpu.train.export import save_artifact

        example = jnp.zeros((batch,) + feats.shape[1:], jnp.float32)
        save_artifact(
            args.export, predict_batch, (example,),
            meta={"feature_mode": feature_mode, "batch": batch,
                  "n_cbgs": world.n_cbgs, "feat_dim": feats.shape[2]},
        )
        print(f"serving artifact written: {args.export}")

    preds = np.zeros(len(policies), np.float32)
    lat_ms = []
    pad_shape = (batch,) + feats.shape[1:]
    for lo in range(0, len(policies), batch):
        chunk = feats[lo: lo + batch]
        bx = np.zeros(pad_shape, np.float32)
        bx[: len(chunk)] = chunk
        t0 = time.perf_counter()
        out = np.asarray(predict_batch(jnp.asarray(bx)))
        lat_ms.append((time.perf_counter() - t0) * 1e3)
        preds[lo: lo + len(chunk)] = out[: len(chunk)]

    with open(args.out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Vaccinated_Idxs", "Prediction"])
        for p, y in zip(policies, preds):
            w.writerow(["[" + ", ".join(map(str, p)) + "]", float(y)])

    served = lat_ms[1:] or lat_ms  # first batch includes compile
    print(
        f"served {len(policies)} policies in {len(lat_ms)} batches of {batch}; "
        f"latency p50={np.percentile(served, 50):.2f}ms "
        f"p99={np.percentile(served, 99):.2f}ms"
    )
    return preds


if __name__ == "__main__":
    main()
