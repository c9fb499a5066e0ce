import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from pygcn_tpu.graph import Graph, sym_normalize, symmetrize_max
from pygcn_tpu.nn.models import GCNOverMLP, SoftGenerator, TopKGenerator
from pygcn_tpu.policy import (
    ReplayBuffer,
    SimCache,
    extract_policy,
    gumbel_topk_sample,
    make_generator_train_step,
    make_reinforce_episode,
    normalize_rewards,
)
from pygcn_tpu.train import adam_l2


def small_graph(n=40, e=300, seed=0):
    rng = np.random.default_rng(seed)
    m = sp.coo_matrix(
        (rng.uniform(0.1, 1.0, e), (rng.integers(0, n, e), rng.integers(0, n, e))),
        shape=(n, n),
    )
    return Graph.from_scipy(
        sym_normalize(symmetrize_max(m)), is_symmetric=True, build_dense=True
    )


def test_generator_training_reduces_evaluator_output():
    """Gradients must flow through the frozen evaluator into the generator."""
    n = 40
    g = small_graph(n)
    dim_touched, extra = 6, 2
    nn_select = 5
    rng = np.random.default_rng(0)
    gen_feats = jnp.asarray(rng.normal(size=(n, dim_touched + extra)).astype(np.float32))
    eval_base = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))

    evaluator = GCNOverMLP(
        gcn_nfeat=4, gcn_nhid=8, gcn_nclass=4, dim_touched=4,
        linear_nin=4 + (9 - 4) - 1, linear_nhid1=16, linear_nhid2=8, linear_nout=1,
    )
    eval_params = evaluator.init(jax.random.key(0))

    generator = TopKGenerator(
        gcn_nfeat=dim_touched, gcn_nhid=8, gcn_nclass=4, dim_touched=dim_touched,
        nn_select=nn_select, linear_nin=4 + extra, linear_nhid1=16, linear_nhid2=8,
    )
    gen_params = generator.init(jax.random.key(1))
    tx = adam_l2(0.01)
    opt_state = tx.init(gen_params)

    step = make_generator_train_step(generator, evaluator, eval_params, tx, g, eval_base)
    losses = []
    for _ in range(30):
        gen_params, opt_state, loss, vac_flag = step(gen_params, opt_state, gen_feats)
        losses.append(float(loss))
    # optimization must actually move the loss
    assert losses[-1] < losses[0]
    # and the flag stays a valid top-K selection
    policy = extract_policy(vac_flag)
    assert len(policy) == nn_select


def test_gumbel_topk_distinct_and_weighted():
    probs = jnp.asarray(np.array([0.01] * 18 + [0.4, 0.42], np.float32))
    probs = probs / probs.sum()
    counts = np.zeros(20)
    for i in range(200):
        idx = np.asarray(gumbel_topk_sample(jax.random.key(i), probs, 3))
        assert len(set(idx.tolist())) == 3
        counts[idx] += 1
    # the two heavy nodes should almost always be selected
    assert counts[18] > 150 and counts[19] > 150


def test_reinforce_learns_target_set():
    """Reward = overlap with a target set → probability mass moves there."""
    n = 30
    g = small_graph(n)
    dim_touched = 6
    model = SoftGenerator(
        gcn_nfeat=dim_touched, gcn_nhid=8, gcn_nclass=8, dim_touched=dim_touched,
        nn_select=5, linear_nhid1=16, linear_nhid2=8,
    )
    params = model.init(jax.random.key(0))
    feats = jnp.asarray(
        np.random.default_rng(0).normal(size=(n, dim_touched)).astype(np.float32)
    )
    tx = adam_l2(0.05)
    opt_state = tx.init(params)
    sample_actions, update = make_reinforce_episode(model, tx, g)

    target = set(range(5))
    key = jax.random.key(42)
    for ep in range(25):
        key, sub = jax.random.split(key)
        actions = sample_actions(params, feats, sub, width=32, nn=5)
        rewards = jnp.asarray(
            [len(target & set(np.asarray(a).tolist())) for a in actions],
            jnp.float32,
        )
        params, opt_state, loss, avg_r = update(params, opt_state, feats, actions, rewards)

    probs = np.asarray(model.apply(params, feats, g))
    assert probs[:5].sum() > 5.0 / n  # mass concentrated beyond uniform
    assert probs[:5].sum() > probs[5:10].sum()


def test_normalize_rewards():
    r = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    z = normalize_rewards(r)
    np.testing.assert_allclose(float(z.mean()), 0.0, atol=1e-6)


def test_replay_buffer():
    buf = ReplayBuffer(capacity=10)
    buf.store_transition([1, 2, 3], 5.0)
    buf.store_transition([4, 5, 6], -2.0)
    assert buf.count == 2
    assert buf.min_reward == -2.0 and buf.min_reward_idx == 1
    actions, reward = buf.get_action_and_reward(np.random.default_rng(0))
    assert actions in ([1, 2, 3], [4, 5, 6])
    buf.clear()
    assert buf.count == 0


def test_sim_cache_memoization(tmp_path):
    cache = SimCache(str(tmp_path))
    calls = []

    def fake_eval(policies):
        calls.append(len(policies))
        return [(sum(p), 0.1) for p in policies]

    policies = [(1, 2), (3, 4), (1, 2)]
    out = cache.evaluate_batch(policies, fake_eval)
    assert calls == [2]  # deduped misses only
    assert out[0] == out[2] == (3, 0.1)

    cache.dump("a")
    cache2 = SimCache(str(tmp_path))
    assert cache2.get((3, 4)) == (7, 0.1)
    out2 = cache2.evaluate_batch(policies, fake_eval)
    assert calls == [2]  # everything served from disk-merged cache
