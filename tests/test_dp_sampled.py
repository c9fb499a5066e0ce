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
    blocks, input_nodes = stack_shard_batches(samples)
    assert len(blocks) == 2
    assert input_nodes.shape[0] == G
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


def test_fetch_plan_reconstructs_rows():
    rng = np.random.default_rng(5)
    shard_size, g, n_in = 16, 4, 11
    x = rng.normal(size=(g * shard_size, 6)).astype(np.float32)
    input_nodes = rng.integers(0, g * shard_size, size=(g, n_in))
    req_idx, inv_perm = build_fetch_plan(input_nodes, shard_size)
    assert req_idx.shape[0] == g and req_idx.shape[1] == g
    k = req_idx.shape[2]
    assert (k & (k - 1)) == 0  # pow2 padding keeps distinct shapes O(log)
    # emulate the all_to_all by hand: requester r's recv[o] = x_o[req_idx[o,r]]
    for r in range(g):
        recv = np.stack([
            x[o * shard_size : (o + 1) * shard_size][req_idx[o, r]]
            for o in range(g)
        ])
        got = recv.reshape(g * k, -1)[inv_perm[r]]
        np.testing.assert_array_equal(got, x[input_nodes[r]])


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
    plan = build_fetch_plan(batch.input_nodes, s)
    step_fs = make_dp_sampled_step(
        mesh, sampled_gcn_forward, tx, feature_sharded=True
    )
    blocks_d, req_d, inv_d, y_d = step_fs.place(batch.blocks, plan, y)
    new_params, _, loss = step_fs(
        params, opt_state, blocks_d, req_d, inv_d, x_shard, y_d
    )

    assert np.isclose(float(loss), float(ref_loss), rtol=1e-6, atol=1e-7)
    for got, want in zip(
        jax.tree.leaves(new_params), jax.tree.leaves(ref_params)
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
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
