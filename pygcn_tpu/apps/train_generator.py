"""Differentiable policy-generator trainer (reference ``policy-generator.py``,
E6, and ``hierarchical-policy-generator.py``, E7, via ``--hierarchical``).

Loads a frozen trained evaluator, optimizes a (Hierarchical)TopKGenerator by
backpropagating the evaluator's prediction into the generator through the
straight-through top-K flag, collects the distinct policies encountered, and
finally validates each with the real epidemic simulator
(reference ``policy-generator.py:384-438``).

Usage::

    python -m pygcn_tpu.apps.train_generator --evaluator /tmp/eval_run/evaluator.pkl \
        --out_dir /tmp/gen_run --epochs 50
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

from pygcn_tpu.apps.common import build_synthetic_world, policy_outcomes, run_policy_simulation
from pygcn_tpu.data.features import centrality_features, generator_features, standardize
from pygcn_tpu.policy import extract_policy, make_generator_train_step
from pygcn_tpu.train import adam_l2
from pygcn_tpu.utils.logging import MetricsLogger


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--evaluator", required=True, help="evaluator.pkl from train_evaluator")
    ap.add_argument("--hierarchical", action="store_true",
                    help="mask a target demographic group out of the policy (E7)")
    ap.add_argument("--target_group", type=int, default=0)
    ap.add_argument("--num_groups", type=int, default=3)
    ap.add_argument("--msa_name", default="SanFrancisco")
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--weight_decay", type=float, default=5e-4)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--NN", type=int, default=5)
    ap.add_argument("--vaccination_ratio", type=float, default=0.01)
    ap.add_argument("--num_seeds", type=int, default=8)
    ap.add_argument("--quicktest", action="store_true")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--n_cbgs", type=int, default=64)
    ap.add_argument("--n_pois", type=int, default=20)
    ap.add_argument("--hours", type=int, default=96)
    ap.add_argument("--max_validate", type=int, default=8)
    ap.add_argument("--out_dir", required=True)
    args = ap.parse_args(argv)

    from pygcn_tpu.apps.common import set_process_title

    set_process_title("train_generator")

    import jax
    import jax.numpy as jnp

    from pygcn_tpu.nn.models import GCNOverMLP, HierarchicalGenerator, TopKGenerator
    from pygcn_tpu.sim.policies import assign_groups, get_separators

    if args.quicktest:
        args.num_seeds = 2
        args.epochs = min(args.epochs, 5)

    os.makedirs(args.out_dir, exist_ok=True)
    world = build_synthetic_world(
        n_cbgs=args.n_cbgs, n_pois=args.n_pois, hours=args.hours,
        msa_name=args.msa_name, seed=args.seed,
    )

    with open(args.evaluator, "rb") as f:
        ev = pickle.load(f)
    evaluator = GCNOverMLP(**ev["model_config"])
    eval_params = jax.tree.map(jnp.asarray, ev["params"])  # frozen

    # generator features: demographics+embeddings+centralities, tiled ×2
    cent = centrality_features(world.adj)
    base = np.concatenate([standardize(world.demographics), standardize(world.embeddings)], axis=1)
    gen_feats, dim_touched = generator_features(base, cent)
    if args.hierarchical:
        # last feature dim = demographic group id (reference
        # hierarchical-policy-generator.py:132-137)
        feat = world.demographics[:, 2]  # income
        seps = get_separators(world.sizes, feat, args.num_groups, normalized=False)
        groups = assign_groups(feat, seps).astype(np.float32)
        gen_feats = np.concatenate([gen_feats, groups[:, None]], axis=1)

    # evaluator feature base (duplicated block layout minus the flag,
    # reference policy-generator.py:398-399)
    eval_block = np.concatenate([standardize(world.demographics), standardize(world.embeddings), cent], axis=1)
    # the evaluator's expected input width (minus the trailing vac flag)
    needed = evaluator.dim_touched + (evaluator.linear_nin - evaluator.gcn_nclass + 1) - 1
    if needed == 2 * eval_block.shape[1]:
        eval_base = np.concatenate([eval_block, eval_block], axis=1)
    elif needed == eval_block.shape[1]:
        eval_base = eval_block
    else:
        raise ValueError(
            f"evaluator expects {needed} base feature dims, world provides "
            f"{eval_block.shape[1]} (or doubled)"
        )

    common = dict(
        gcn_nfeat=dim_touched, gcn_nhid=args.hidden, gcn_nclass=args.hidden,
        dim_touched=dim_touched, nn_select=args.NN,
        linear_nhid1=64, linear_nhid2=8, linear_nout=1,
    )
    extra = gen_feats.shape[1] - dim_touched - (1 if args.hierarchical else 0)
    if args.hierarchical:
        generator = HierarchicalGenerator(
            linear_nin=args.hidden + extra, target_group=args.target_group, **common
        )
    else:
        generator = TopKGenerator(linear_nin=args.hidden + extra, **common)

    gen_params = generator.init(jax.random.key(args.seed))
    tx = adam_l2(args.lr, args.weight_decay)
    opt_state = tx.init(gen_params)
    step = make_generator_train_step(
        generator, evaluator, eval_params, tx, world.graph, jnp.asarray(eval_base)
    )

    logger = MetricsLogger(os.path.join(args.out_dir, "metrics.jsonl"))
    gen_feats_j = jnp.asarray(gen_feats)
    policy_list = []
    for epoch in range(args.epochs):
        gen_params, opt_state, loss, vac_flag = step(gen_params, opt_state, gen_feats_j)
        policy = extract_policy(vac_flag)
        if policy not in policy_list:
            policy_list.append(policy)
        logger.log(epoch, train_loss=loss, n_policies=len(policy_list))

    # final: score distinct policies with the real simulator
    num_vaccines_per_cbg = world.sizes.sum() * args.vaccination_ratio / args.NN
    key = jax.random.key(args.seed)
    results = []
    for policy in policy_list[-args.max_validate:]:
        v = np.zeros(world.n_cbgs)
        v[list(policy)] = num_vaccines_per_cbg
        key, sub = jax.random.split(key)
        out = run_policy_simulation(world, v, args.num_seeds, sub)
        cases, case_std, deaths, death_std = policy_outcomes(out, world.sizes)
        results.append({"policy": list(policy), "total_cases": cases,
                        "case_rates_std": case_std})
        print(f"policy {policy}: total_cases={cases:.1f} case_std={case_std:.5f}")

    with open(os.path.join(args.out_dir, "policies.pkl"), "wb") as f:
        pickle.dump({"results": results,
                     "gen_params": jax.tree.map(np.asarray, gen_params)}, f)
    logger.close()
    return results


if __name__ == "__main__":
    main()
