"""Data-parallel sampled training (parallel/dp_sampled.py).

Parity contract: one dp step over G shards == averaging the G per-shard
gradients computed by the single-device sampled path on the same sampled
blocks, then applying the same optimizer update.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pygcn_tpu.graph.datasets import sbm_classification
from pygcn_tpu.ops.sampling import (
    NeighborSampler,
    SampledBatch,
    SampledBlock,
    sampled_gcn_forward,
)
from pygcn_tpu.parallel.dp_sampled import (
    ShardedNeighborSampler,
    build_fetch_plan,
    make_dp_sampled_step,
    shard_feature_rows,
    stack_shard_batches,
)
from pygcn_tpu.parallel.mesh import make_mesh


G, B = 4, 8  # shards x per-shard batch


@pytest.fixture(scope="module")
def setup():
    data = sbm_classification(
        n=200, n_classes=4, feat_dim=12, avg_degree=6.0, seed=0,
        train_per_class=12, n_val=20, n_test=40,
        build_dense=False, build_bcsr=False, build_ell=False,
    )
    a = data.graph.to_scipy().tocsr()
    key = jax.random.key(0)
    dims = [12, 16, data.n_classes]
    params = []
    for fi, fo in zip(dims[:-1], dims[1:]):
        key, kw, kb = jax.random.split(key, 3)
        params.append({
            "w": jax.random.normal(kw, (fi, fo)) * 0.1,
            "b": jnp.zeros((fo,)),
        })
    return data, a, params


def test_stack_shard_batches_shapes(setup):
    data, a, params = setup
    sampler = NeighborSampler(a, fanouts=[3, 2], mode="gcn", seed=7)
    rng = np.random.default_rng(0)
    seeds = rng.choice(data.idx_train, size=G * B, replace=True)
    samples = [
        sampler.sample_np(s, pad=True) for s in seeds.reshape(G, B)
    ]
    blocks, input_nodes, n_valid = stack_shard_batches(samples)
    assert len(blocks) == 2
    assert input_nodes.shape[0] == G
    # n_valid is the PRE-pad dedup size (what the fetch planner trusts):
    # it must match an unpadded replay of the same draws exactly
    assert (n_valid == [s[2] for s in samples]).all()
    assert (n_valid <= input_nodes.shape[1]).all()
    replay = NeighborSampler(a, fanouts=[3, 2], mode="gcn", seed=7)
    unpadded = [
        replay.sample_np(s)[1].size for s in seeds.reshape(G, B)
    ]
    assert list(n_valid) == unpadded
    for b in blocks:
        assert b.cols.shape[0] == G
        assert b.cols.shape == b.weights.shape
        assert b.self_idx.shape == b.cols.shape[:2]
        # group-max re-padding keeps dims powers of two (or the seed count)
        m = b.cols.shape[1]
        assert m == B or (m & (m - 1)) == 0
    # outermost block rows == seeds per shard
    assert blocks[-1].cols.shape[1] == B
    # real rows must be bit-identical to the per-shard sample
    for g in range(G):
        for d in range(2):
            m = samples[g][0][d][0].shape[0]
            np.testing.assert_array_equal(
                np.asarray(blocks[d].cols[g][:m]), samples[g][0][d][0]
            )


def test_dp_step_matches_shard_grad_average(setup):
    data, a, params = setup
    sampler = NeighborSampler(a, fanouts=[3, 2], mode="gcn", seed=7)
    group = ShardedNeighborSampler(sampler, G)
    rng = np.random.default_rng(1)
    seeds = rng.choice(data.idx_train, size=G * B, replace=True)
    batch = group(seeds)
    y = np.asarray(data.labels)[batch.output_nodes]  # [G, B]

    mesh = make_mesh([G], ("data",))
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    x_all = jnp.asarray(data.features)

    step = make_dp_sampled_step(mesh, sampled_gcn_forward, tx)
    blocks_d, input_nodes_d, y_d = step.place(
        batch.blocks, batch.input_nodes, y
    )
    new_params, _, loss = step(
        params, opt_state, blocks_d, input_nodes_d, x_all, y_d
    )

    # reference: average the G single-shard grads
    def shard_loss(p, g):
        local = SampledBatch(
            blocks=[
                SampledBlock(
                    cols=b.cols[g], weights=b.weights[g], self_idx=b.self_idx[g]
                )
                for b in batch.blocks
            ],
            input_nodes=None,
            output_nodes=None,
        )
        x_in = x_all[jnp.asarray(batch.input_nodes[g])]
        logits = sampled_gcn_forward(p, local, x_in)
        logp = jax.nn.log_softmax(logits, axis=1)
        yl = jnp.asarray(y[g])
        return -jnp.take_along_axis(logp, yl[:, None], axis=1).mean()

    losses, grads = zip(*[
        jax.value_and_grad(shard_loss)(params, g) for g in range(G)
    ])
    avg_loss = np.mean([float(l) for l in losses])
    avg_grads = jax.tree.map(lambda *ts: sum(ts) / G, *grads)
    updates, _ = tx.update(avg_grads, tx.init(params), params)
    ref_params = optax.apply_updates(params, updates)

    assert np.isclose(float(loss), avg_loss, rtol=1e-5, atol=1e-6)
    for got, want in zip(
        jax.tree.leaves(new_params), jax.tree.leaves(ref_params)
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
        )


def _emulate_fetch(x, plan, shard_size, g):
    """Replay the device gather (local + all_to_all) with NumPy."""
    req_idx, loc_idx, inv_perm = plan
    k = req_idx.shape[2]
    out = []
    for r in range(g):
        recv = np.stack([
            x[o * shard_size : (o + 1) * shard_size][req_idx[o, r]]
            for o in range(g)
        ])
        loc = x[r * shard_size : (r + 1) * shard_size][loc_idx[r]]
        rows = np.concatenate([recv.reshape(g * k, -1), loc])
        out.append(rows[inv_perm[r]])
    return np.stack(out)


def test_fetch_plan_reconstructs_rows():
    rng = np.random.default_rng(5)
    shard_size, g, n_in = 16, 4, 11
    x = rng.normal(size=(g * shard_size, 6)).astype(np.float32)
    input_nodes = rng.integers(0, g * shard_size, size=(g, n_in))
    plan = build_fetch_plan(input_nodes, shard_size)
    req_idx, loc_idx, _ = plan
    assert req_idx.shape[0] == g and req_idx.shape[1] == g
    k = req_idx.shape[2]
    assert (k & (k - 1)) == 0  # pow2 padding keeps distinct shapes O(log)
    # own rows never enter the all_to_all payload
    for o in range(g):
        own_local = (input_nodes[o] // shard_size) == o
        assert k <= _pow2_ref(
            max(1, int((~own_local).sum()))
        )
    got = _emulate_fetch(x, plan, shard_size, g)
    for r in range(g):
        np.testing.assert_array_equal(got[r], x[input_nodes[r]])


def _pow2_ref(n):
    p = 1
    while p < n:
        p <<= 1
    return p


def test_fetch_plan_n_valid_excludes_padding():
    """Pad entries must not inflate K nor break real-row reconstruction."""
    rng = np.random.default_rng(8)
    shard_size, g = 16, 4
    x = rng.normal(size=(g * shard_size, 3)).astype(np.float32)
    # every shard's real rows are its OWN rows; pads are global id 0
    real = np.stack([
        rng.integers(o * shard_size, (o + 1) * shard_size, size=6)
        for o in range(g)
    ])
    input_nodes = np.concatenate(
        [real, np.zeros((g, 10), np.int64)], axis=1
    )
    n_valid = np.full(g, 6)
    plan = build_fetch_plan(input_nodes, shard_size, n_valid=n_valid)
    assert plan[0].shape[2] == 1  # no remote rows at all -> K collapses
    got = _emulate_fetch(x, plan, shard_size, g)
    for r in range(g):
        np.testing.assert_array_equal(got[r][:6], x[input_nodes[r][:6]])
    # without n_valid the shard-0-owned pads force K >= 10
    plan_pad = build_fetch_plan(input_nodes, shard_size)
    assert plan_pad[0].shape[2] >= 10


def test_feature_sharded_step_matches_replicated(setup):
    data, a, params = setup
    sampler = NeighborSampler(a, fanouts=[3, 2], mode="gcn", seed=7)
    group = ShardedNeighborSampler(sampler, G)
    rng = np.random.default_rng(2)
    seeds = rng.choice(data.idx_train, size=G * B, replace=True)
    batch = group(seeds)
    y = np.asarray(data.labels)[batch.output_nodes]

    mesh = make_mesh([G], ("data",))
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    x_all = jnp.asarray(data.features)

    # replicated reference
    step_r = make_dp_sampled_step(mesh, sampled_gcn_forward, tx)
    blocks_d, in_d, y_d = step_r.place(batch.blocks, batch.input_nodes, y)
    ref_params, _, ref_loss = step_r(
        params, opt_state, blocks_d, in_d, x_all, y_d
    )

    # row-sharded feature store + all_to_all fetch
    x_shard, s = shard_feature_rows(mesh, np.asarray(data.features))
    plan = build_fetch_plan(
        batch.input_nodes, s, n_valid=batch.n_input_valid
    )
    step_fs = make_dp_sampled_step(
        mesh, sampled_gcn_forward, tx, feature_sharded=True
    )
    blocks_d, req_d, loc_d, inv_d, y_d = step_fs.place(batch.blocks, plan, y)
    new_params, _, loss = step_fs(
        params, opt_state, blocks_d, req_d, loc_d, inv_d, x_shard, y_d
    )

    assert np.isclose(float(loss), float(ref_loss), rtol=1e-6, atol=1e-7)
    for got, want in zip(
        jax.tree.leaves(new_params), jax.tree.leaves(ref_params)
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
        )


def test_align_seeds_cuts_ici_volume():
    """Owner-aligned seeds on a locality-ordered graph shrink the fetch.

    Nodes are relabeled community-by-community (here: ground-truth SBM
    blocks), so contiguous row shards own communities; routing each seed to
    the shard owning its rows then makes most sampled neighbors local and
    the all_to_all payload (K) collapse.
    """
    from pygcn_tpu.parallel.dp_sampled import fetch_plan_stats

    data = sbm_classification(
        n=512, n_classes=G, feat_dim=8, avg_degree=8.0, seed=1,
        homophily=0.95, train_per_class=64, n_val=16, n_test=16,
        build_dense=False, build_bcsr=False, build_ell=False,
    )
    # locality relabeling: community-contiguous node ids
    perm = np.argsort(data.labels, kind="stable")  # perm[new] = old
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    a_old = data.graph.to_scipy().tocsr()
    a = a_old[perm][:, perm].tocsr()
    mesh = make_mesh([G], ("data",))
    _, s = shard_feature_rows(mesh, np.asarray(data.features)[perm])
    seeds = inv[np.random.default_rng(4).choice(
        data.idx_train, size=G * 64, replace=True
    )]

    stats = {}
    for name, kw in (("random", {}), ("aligned", {"align_shard_size": s})):
        group = ShardedNeighborSampler(
            NeighborSampler(a, fanouts=[3, 2], seed=7), G, **kw
        )
        batch = group(seeds)
        plan = build_fetch_plan(
            batch.input_nodes, s, n_valid=batch.n_input_valid
        )
        stats[name] = fetch_plan_stats(
            plan, batch.input_nodes, s, n_valid=batch.n_input_valid
        )
    assert (
        stats["aligned"]["local_frac"] > stats["random"]["local_frac"] + 0.15
    )
    assert (
        stats["aligned"]["rows_over_ici"] < stats["random"]["rows_over_ici"]
    )
    # aligned routing is a permutation of the same global batch
    group_a = ShardedNeighborSampler(
        NeighborSampler(a, fanouts=[3, 2], seed=7), G, align_shard_size=s
    )
    batch_a = group_a(seeds)
    np.testing.assert_array_equal(
        np.sort(batch_a.output_nodes.ravel()), np.sort(seeds)
    )


def test_reorder_dataset_is_same_problem(setup):
    """reorder_dataset relabels consistently: same edges, labels, splits."""
    from pygcn_tpu.parallel.partition import reorder_dataset

    data, a, params = setup
    rng = np.random.default_rng(9)
    perm = rng.permutation(data.graph.n_nodes)
    new = reorder_dataset(data, perm)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)

    np.testing.assert_array_equal(
        np.asarray(new.features), np.asarray(data.features)[perm]
    )
    np.testing.assert_array_equal(
        np.asarray(new.labels)[inv], np.asarray(data.labels)
    )
    np.testing.assert_array_equal(
        np.asarray(new.labels)[new.idx_train],
        np.asarray(data.labels)[data.idx_train],
    )
    a_new = new.graph.to_scipy().tocsr()
    np.testing.assert_allclose(
        a_new[inv][:, inv].toarray(), a.toarray(), rtol=1e-6
    )


def test_threaded_group_sampling_bit_identical(setup):
    data, a, params = setup
    rng = np.random.default_rng(3)
    seeds = rng.choice(data.idx_train, size=G * B, replace=True)

    serial = ShardedNeighborSampler(
        NeighborSampler(a, fanouts=[3, 2], seed=11), G
    )
    threaded = ShardedNeighborSampler(
        NeighborSampler(a, fanouts=[3, 2], seed=11), G, workers=4
    )
    for _ in range(3):  # multiple group calls advance the shared counter
        bs = serial(seeds)
        bt = threaded(seeds)
        np.testing.assert_array_equal(bs.input_nodes, bt.input_nodes)
        for s_blk, t_blk in zip(bs.blocks, bt.blocks):
            np.testing.assert_array_equal(
                np.asarray(s_blk.cols), np.asarray(t_blk.cols)
            )
            np.testing.assert_array_equal(
                np.asarray(s_blk.weights), np.asarray(t_blk.weights)
            )
            np.testing.assert_array_equal(
                np.asarray(s_blk.self_idx), np.asarray(t_blk.self_idx)
            )


def test_sharded_sampler_rejects_indivisible(setup):
    data, a, params = setup
    sampler = NeighborSampler(a, fanouts=[2], seed=0)
    group = ShardedNeighborSampler(sampler, 4)
    with pytest.raises(ValueError):
        group(np.arange(10))
