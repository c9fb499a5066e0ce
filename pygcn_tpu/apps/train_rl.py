"""REINFORCE policy trainer (reference ``rl-policy-generator.py``, E8).

Per episode: sample ``--epoch_width`` policies from the SoftGenerator's
attention distribution (Gumbel-top-k without replacement), evaluate each with
the epidemic simulator through the persistent memo-cache (misses are batched
and **vmapped on device** — the reference's multiprocessing pool becomes a
batch axis), reward = random-policy baseline − total cases, push the top-2
into the replay buffer, replay ``--replay_width`` stored actions, and apply
the normalized-reward REINFORCE update with max-avg-reward checkpointing
(reference ``rl-policy-generator.py:324-417, 550-604``). Ends with greedy
top-K extraction + simulator validation (:629-659).

Usage::

    python -m pygcn_tpu.apps.train_rl --out_dir /tmp/rl_run --episodes 5
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

from pygcn_tpu.apps.common import build_synthetic_world
from pygcn_tpu.apps.gt_gen import batch_policy_outcomes
from pygcn_tpu.data.features import centrality_features, generator_features, standardize
from pygcn_tpu.policy import ReplayBuffer, SimCache, make_reinforce_episode
from pygcn_tpu.policy.reinforce import greedy_policy
from pygcn_tpu.train import adam_l2
from pygcn_tpu.utils.logging import MetricsLogger


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--msa_name", default="SanFrancisco")
    ap.add_argument("--episodes", type=int, default=10)
    ap.add_argument("--epoch_width", type=int, default=32,
                    help="policies sampled per episode (reference: 1000)")
    ap.add_argument("--replay_width", type=int, default=4)
    ap.add_argument("--replay_capacity", type=int, default=100)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--NN", type=int, default=5)
    ap.add_argument("--vaccination_ratio", type=float, default=0.01)
    ap.add_argument("--num_seeds", type=int, default=4)
    ap.add_argument("--quicktest", action="store_true")
    ap.add_argument("--approx", action="store_true",
                    help="fast count sampling for the simulation oracle")
    ap.add_argument("--shards", type=int, default=0,
                    help="shard simulator fan-out over N devices (the reference's "
                         "multiprocessing pool as a mesh data axis)")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--n_cbgs", type=int, default=64)
    ap.add_argument("--n_pois", type=int, default=20)
    ap.add_argument("--hours", type=int, default=96)
    ap.add_argument("--save_checkpoint", action="store_true", default=True)
    ap.add_argument("--out_dir", required=True)
    args = ap.parse_args(argv)

    from pygcn_tpu.apps.common import set_process_title

    set_process_title("train_rl")

    import jax
    import jax.numpy as jnp

    from pygcn_tpu.nn.models import SoftGenerator
    from pygcn_tpu.sim.policies import vaccine_distribution_fixed_nn

    if args.quicktest:
        args.num_seeds = 2
        args.episodes = min(args.episodes, 3)
        args.epoch_width = min(args.epoch_width, 8)

    mesh = None
    if args.shards:
        from pygcn_tpu.parallel import make_mesh

        mesh = make_mesh([args.shards], ["data"])

    os.makedirs(args.out_dir, exist_ok=True)
    world = build_synthetic_world(
        n_cbgs=args.n_cbgs, n_pois=args.n_pois, hours=args.hours,
        msa_name=args.msa_name, seed=args.seed,
    )
    cent = centrality_features(world.adj)
    base = np.concatenate([standardize(world.demographics), standardize(world.embeddings)], axis=1)
    gen_feats, dim_touched = generator_features(base, cent, tile=1)
    gen_feats_j = jnp.asarray(gen_feats)

    model = SoftGenerator(
        gcn_nfeat=dim_touched, gcn_nhid=args.hidden, gcn_nclass=args.hidden,
        dim_touched=dim_touched, nn_select=args.NN,
        linear_nhid1=64, linear_nhid2=8,
    )
    params = model.init(jax.random.key(args.seed))
    tx = adam_l2(args.lr)
    opt_state = tx.init(params)
    sample_actions, update = make_reinforce_episode(model, tx, world.graph)

    cache = SimCache(args.out_dir)
    replay = ReplayBuffer(args.replay_capacity)
    rng = np.random.default_rng(args.seed)
    key = jax.random.key(args.seed)

    def simulate_policies(policies):
        """Batched, memoized simulator evaluation → [(total_cases, case_std)]."""
        def evaluate(missing):
            vectors = np.stack([
                vaccine_distribution_fixed_nn(
                    world.sizes, args.vaccination_ratio, args.NN,
                    proportional=True, target_idxs=list(p),
                )
                for p in missing
            ])
            nonlocal key
            key, sub = jax.random.split(key)
            rows = batch_policy_outcomes(world, vectors, args.num_seeds, sub,
                                         args.approx, mesh=mesh)
            return [(r[0], r[1]) for r in rows]

        return cache.evaluate_batch(policies, evaluate)

    # reward baseline: random policies (reference hardcodes 7280 for its MSA,
    # rl-policy-generator.py:541 — here it's measured on the synthetic world)
    key, sub = jax.random.split(key)
    rand_policies = [tuple(sorted(rng.choice(world.n_cbgs, args.NN, replace=False)))
                     for _ in range(8)]
    baseline = float(np.mean([c for c, _ in simulate_policies(rand_policies)]))
    print(f"random-policy baseline cases: {baseline:.1f}")

    logger = MetricsLogger(os.path.join(args.out_dir, "metrics.jsonl"))
    ckpt_path = os.path.join(args.out_dir, "checkpoint_rl.pkl")
    max_avg_reward = -np.inf
    for episode in range(args.episodes):
        key, sub = jax.random.split(key)
        actions = np.asarray(
            sample_actions(params, gen_feats_j, sub, width=args.epoch_width, nn=args.NN)
        )
        policies = [tuple(sorted(a.tolist())) for a in actions]
        outcomes = simulate_policies(policies)
        rewards = np.array([baseline - c for c, _ in outcomes], np.float32)

        # top-2 into replay (reference :565-573)
        for i in np.argsort(rewards)[-2:]:
            replay.store_transition(actions[i].tolist(), float(rewards[i]))
        # replay extra samples under the current policy (reference :574-579)
        replay_actions, replay_rewards = [], []
        for _ in range(min(args.replay_width, replay.count)):
            a, r = replay.get_action_and_reward(rng)
            replay_actions.append(a)
            replay_rewards.append(r)
        if replay_actions:
            actions = np.concatenate([actions, np.asarray(replay_actions)], axis=0)
            rewards = np.concatenate([rewards, np.asarray(replay_rewards, np.float32)])

        params, opt_state, loss, avg_reward = update(
            params, opt_state, gen_feats_j, jnp.asarray(actions), jnp.asarray(rewards)
        )
        avg_reward = float(avg_reward)
        logger.log(episode, loss=loss, avg_reward=avg_reward, cache=len(cache))
        if episode == 0 or avg_reward > max_avg_reward:
            max_avg_reward = avg_reward
            if args.save_checkpoint:
                with open(ckpt_path, "wb") as f:
                    pickle.dump({
                        "episode": episode,
                        "params": jax.tree.map(np.asarray, params),
                        "avg_rewards": avg_reward,
                    }, f)
        cache.dump(str(args.seed))

    # final greedy policy + validation (reference :629-659)
    probs = model.apply(params, gen_feats_j, world.graph)
    best = greedy_policy(probs, args.NN)
    (final_cases, final_std), = simulate_policies([tuple(sorted(best.tolist()))])
    print(f"greedy policy {sorted(best.tolist())}: cases={final_cases:.1f} "
          f"(baseline {baseline:.1f})")
    logger.close()
    return final_cases, baseline


if __name__ == "__main__":
    main()
