import jax
import jax.numpy as jnp
import numpy as np
import optax

from pygcn_tpu.graph.datasets import sbm_classification
from pygcn_tpu.graph.transform import sym_normalize, symmetrize_max
from pygcn_tpu.nn import init as tinit
from pygcn_tpu.ops.sampling import (
    NeighborSampler,
    aggregate_block,
    sampled_gcn_forward,
)
from pygcn_tpu.train import adam_l2


def test_sampled_aggregation_unbiased():
    """E[sampled gcn aggregation] == full A_hat @ h row."""
    rng = np.random.default_rng(0)
    import scipy.sparse as sp

    n = 60
    m = sp.random(n, n, density=0.2, random_state=0, format="coo")
    a = sym_normalize(symmetrize_max(m))
    h = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    full = a.toarray() @ np.asarray(h)

    sampler = NeighborSampler(a, fanouts=[8], mode="gcn", seed=1)
    seeds = np.arange(n)
    acc = np.zeros((n, 8))
    reps = 300
    for _ in range(reps):
        batch = sampler.sample(seeds)
        block = batch.blocks[0]
        h_in = h[jnp.asarray(batch.input_nodes)]
        acc += np.asarray(aggregate_block(block, h_in))
    np.testing.assert_allclose(acc / reps, full, atol=0.15, rtol=0.2)


def test_sampled_shapes_and_padding():
    import scipy.sparse as sp

    m = sp.random(100, 100, density=0.05, random_state=1, format="coo")
    a = sym_normalize(symmetrize_max(m))
    sampler = NeighborSampler(a, fanouts=[4, 4], seed=0)
    seeds = np.array([3, 14, 15])
    batch = sampler.sample(seeds)
    assert len(batch.blocks) == 2
    np.testing.assert_array_equal(batch.output_nodes, seeds)
    # outer block outputs exactly the seeds
    assert batch.blocks[-1].cols.shape == (3, 4)
    # inner block inputs cover all sampled nodes
    assert batch.blocks[0].cols.max() < batch.input_nodes.size


def test_prefetch_iterator_matches_serial():
    """iter_sampled_batches (threaded) yields exactly the serial stream."""
    import scipy.sparse as sp

    from pygcn_tpu.ops.sampling import iter_sampled_batches

    m = sp.random(200, 200, density=0.05, random_state=2, format="coo")
    a = sym_normalize(symmetrize_max(m))
    rng = np.random.default_rng(0)
    seed_batches = [rng.integers(0, 200, 16) for _ in range(6)]

    serial_sampler = NeighborSampler(a, fanouts=[4, 4], seed=7)
    serial = [serial_sampler.sample(s) for s in seed_batches]
    threaded = list(iter_sampled_batches(
        NeighborSampler(a, fanouts=[4, 4], seed=7), seed_batches, prefetch=2
    ))
    assert len(threaded) == len(serial)
    for (seeds, got), want, s_in in zip(threaded, serial, seed_batches):
        np.testing.assert_array_equal(seeds, s_in)
        np.testing.assert_array_equal(got.input_nodes, want.input_nodes)
        for bg, bw in zip(got.blocks, want.blocks):
            np.testing.assert_array_equal(np.asarray(bg.cols), np.asarray(bw.cols))
            np.testing.assert_array_equal(np.asarray(bg.weights), np.asarray(bw.weights))
            np.testing.assert_array_equal(np.asarray(bg.self_idx), np.asarray(bw.self_idx))

    # prefetch=0 degrades to the serial loop
    plain = list(iter_sampled_batches(
        NeighborSampler(a, fanouts=[4, 4], seed=7), seed_batches, prefetch=0
    ))
    for (_, got), want in zip(plain, serial):
        np.testing.assert_array_equal(got.input_nodes, want.input_nodes)


def test_padded_batch_matches_exact():
    """pad=True (pow2 static shapes) changes shapes, not results."""
    import scipy.sparse as sp

    m = sp.random(300, 300, density=0.03, random_state=3, format="coo")
    a = sym_normalize(symmetrize_max(m))
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.normal(size=(300, 8)).astype(np.float32))
    seeds = rng.integers(0, 300, 17)

    params = [
        {"w": tinit.graphconv_weight(jax.random.key(0), 8, 6), "b": jnp.zeros(6)},
        {"w": tinit.graphconv_weight(jax.random.key(1), 6, 4), "b": jnp.zeros(4)},
    ]
    exact = NeighborSampler(a, fanouts=[4, 4], seed=9).sample(seeds)
    padded = NeighborSampler(a, fanouts=[4, 4], seed=9).sample(seeds, pad=True)

    # padded sizes are powers of two and cover the exact ones
    assert padded.input_nodes.size >= exact.input_nodes.size
    assert padded.input_nodes.size & (padded.input_nodes.size - 1) == 0
    assert padded.blocks[-1].cols.shape[0] == seeds.size  # outermost static

    out_exact = sampled_gcn_forward(
        params, exact, h[jnp.asarray(exact.input_nodes)]
    )
    out_padded = sampled_gcn_forward(
        params, padded, h[jnp.asarray(padded.input_nodes)]
    )
    np.testing.assert_allclose(
        np.asarray(out_padded), np.asarray(out_exact), rtol=1e-5, atol=1e-5
    )


def test_sampled_training_reaches_accuracy():
    """2-layer sampled GCN trains to reasonable accuracy on SBM data."""
    data = sbm_classification(n=300, n_classes=3, feat_dim=32, seed=0)
    a = data.graph.to_scipy().tocsr()
    sampler = NeighborSampler(a, fanouts=[5, 5], mode="gcn", seed=0)

    f_in, hid, ncls = data.features.shape[1], 16, data.n_classes
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    params = [
        {"w": tinit.graphconv_weight(k1, f_in, hid), "b": jnp.zeros(hid)},
        {"w": tinit.graphconv_weight(k2, hid, ncls), "b": jnp.zeros(ncls)},
    ]
    tx = adam_l2(0.01, 5e-4)
    opt_state = tx.init(params)
    x_all = jnp.asarray(data.features)
    y_all = np.asarray(data.labels)

    @jax.jit
    def step(params, opt_state, blocks, x_in, y):
        def loss_fn(p):
            from pygcn_tpu.ops.sampling import SampledBatch

            batch = SampledBatch(blocks=blocks, input_nodes=None, output_nodes=None)
            logits = sampled_gcn_forward(p, batch, x_in)
            logp = jax.nn.log_softmax(logits, axis=1)
            return -jnp.take_along_axis(logp, y[:, None], axis=1).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    for epoch in range(60):
        seeds = rng.choice(data.idx_train, 32, replace=False)
        # pad=True is the production path: without it every epoch's node-set
        # size differs and the jitted step recompiles per batch
        batch = sampler.sample(seeds, pad=True)
        params, opt_state, loss = step(
            params, opt_state, batch.blocks,
            x_all[jnp.asarray(batch.input_nodes)],
            jnp.asarray(y_all[seeds]),
        )

    # evaluate with larger fanout on the test seeds
    eval_sampler = NeighborSampler(a, fanouts=[10, 10], mode="gcn", seed=1)
    batch = eval_sampler.sample(data.idx_test)
    from pygcn_tpu.ops.sampling import SampledBatch

    logits = sampled_gcn_forward(
        params,
        SampledBatch(blocks=batch.blocks, input_nodes=None, output_nodes=None),
        x_all[jnp.asarray(batch.input_nodes)],
    )
    acc = float((np.asarray(logits).argmax(1) == y_all[data.idx_test]).mean())
    assert acc > 0.6, acc


def test_sampled_gat_forward_matches_block_reference():
    """Attention over sampled blocks == per-node numpy softmax reference."""
    import scipy.sparse as sp

    from pygcn_tpu.ops.sampling import sampled_gat_forward

    m = sp.random(80, 80, density=0.06, random_state=6, format="coo")
    a = sym_normalize(symmetrize_max(m))
    sampler = NeighborSampler(a, fanouts=[4], mode="gcn", seed=5)
    seeds = np.arange(30)
    batch = sampler.sample(seeds)
    block = batch.blocks[0]
    n_in = batch.input_nodes.size

    rng = np.random.default_rng(6)
    heads, fo = 2, 3
    x = rng.normal(size=(n_in, 5)).astype(np.float32)
    p = {
        "w": jnp.asarray(rng.normal(size=(5, heads * fo)).astype(np.float32)),
        "a_src": jnp.asarray(rng.normal(size=(heads, fo)).astype(np.float32)),
        "a_dst": jnp.asarray(rng.normal(size=(heads, fo)).astype(np.float32)),
    }
    got = np.asarray(sampled_gat_forward([p], batch, jnp.asarray(x)))

    s = (x @ np.asarray(p["w"])).reshape(n_in, heads, fo)
    cols = np.asarray(block.cols)
    w = np.asarray(block.weights)
    self_idx = np.asarray(block.self_idx)
    want = np.zeros((30, fo))
    for i in range(30):
        valid = w[i] > 0
        per_head = np.zeros((heads, fo))
        for hh in range(heads):
            if valid.any():
                lsrc = s[cols[i], hh] @ np.asarray(p["a_src"][hh])
                ldst = s[self_idx[i], hh] @ np.asarray(p["a_dst"][hh])
                e = lsrc + ldst
                e = np.where(e >= 0, e, 0.2 * e)
                e = np.where(valid, e, -np.inf)
                z = np.exp(e - e[valid].max())
                z[~valid] = 0.0
                alpha = z / z.sum()
                per_head[hh] = alpha @ s[cols[i], hh]
            else:
                per_head[hh] = s[self_idx[i], hh]
        want[i] = per_head.mean(0)  # single layer = last layer: head mean
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_sampled_gat_trains():
    """2-layer sampled GAT learns SBM labels to reasonable accuracy."""
    import optax

    from pygcn_tpu.ops.sampling import sampled_gat_forward

    data = sbm_classification(n=300, n_classes=3, feat_dim=32, seed=0)
    a = data.graph.to_scipy().tocsr()
    sampler = NeighborSampler(a, fanouts=[5, 5], mode="gcn", seed=0)

    heads, fo, ncls = 2, 8, data.n_classes
    key = jax.random.key(0)
    ks = jax.random.split(key, 6)
    params = [
        {"w": tinit.graphconv_weight(ks[0], 32, heads * fo),
         "a_src": tinit.graphconv_weight(ks[1], heads, fo),
         "a_dst": tinit.graphconv_weight(ks[2], heads, fo),
         "b": jnp.zeros(heads * fo)},
        {"w": tinit.graphconv_weight(ks[3], heads * fo, 1 * ncls),
         "a_src": tinit.graphconv_weight(ks[4], 1, ncls),
         "a_dst": tinit.graphconv_weight(ks[5], 1, ncls),
         "b": jnp.zeros(ncls)},
    ]
    tx = adam_l2(0.01, 5e-4)
    opt_state = tx.init(params)
    x_all = jnp.asarray(data.features)
    y_all = np.asarray(data.labels)

    @jax.jit
    def step(params, opt_state, blocks, x_in, y):
        def loss_fn(p):
            from pygcn_tpu.ops.sampling import SampledBatch

            batch = SampledBatch(blocks=blocks, input_nodes=None, output_nodes=None)
            logits = sampled_gat_forward(p, batch, x_in)
            logp = jax.nn.log_softmax(logits, axis=1)
            return -jnp.take_along_axis(logp, y[:, None], axis=1).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    for epoch in range(60):
        seeds = rng.choice(data.idx_train, 32, replace=False)
        batch = sampler.sample(seeds, pad=True)
        params, opt_state, loss = step(
            params, opt_state, batch.blocks,
            x_all[jnp.asarray(batch.input_nodes)],
            jnp.asarray(y_all[seeds]),
        )

    eval_sampler = NeighborSampler(a, fanouts=[10, 10], mode="gcn", seed=1)
    batch = eval_sampler.sample(data.idx_test)
    from pygcn_tpu.ops.sampling import SampledBatch, sampled_gat_forward as f

    logits = f(params, SampledBatch(blocks=batch.blocks, input_nodes=None,
                                    output_nodes=None),
               x_all[jnp.asarray(batch.input_nodes)])
    acc = float((np.asarray(logits).argmax(1) == y_all[data.idx_test]).mean())
    assert acc > 0.6, acc


def test_sampled_gatv2_matches_block_reference():
    """v2 attention over sampled blocks == per-node numpy reference
    (a · leaky_relu(s_l[u] + s_r[v]) logits, s_l aggregation)."""
    import scipy.sparse as sp

    from pygcn_tpu.ops.sampling import sampled_gatv2_forward

    m = sp.random(80, 80, density=0.06, random_state=6, format="coo")
    a = sym_normalize(symmetrize_max(m))
    sampler = NeighborSampler(a, fanouts=[4], mode="gcn", seed=5)
    seeds = np.arange(30)
    batch = sampler.sample(seeds)
    block = batch.blocks[0]
    n_in = batch.input_nodes.size

    rng = np.random.default_rng(7)
    heads, fo = 2, 3
    x = rng.normal(size=(n_in, 5)).astype(np.float32)
    p = {
        "w_l": jnp.asarray(rng.normal(size=(5, heads * fo)).astype(np.float32)),
        "w_r": jnp.asarray(rng.normal(size=(5, heads * fo)).astype(np.float32)),
        "a": jnp.asarray(rng.normal(size=(heads, fo)).astype(np.float32)),
    }
    got = np.asarray(sampled_gatv2_forward([p], batch, jnp.asarray(x)))

    s_l = (x @ np.asarray(p["w_l"])).reshape(n_in, heads, fo)
    s_r = (x @ np.asarray(p["w_r"])).reshape(n_in, heads, fo)
    av = np.asarray(p["a"])
    cols = np.asarray(block.cols)
    w = np.asarray(block.weights)
    self_idx = np.asarray(block.self_idx)
    want = np.zeros((30, fo))
    for i in range(30):
        valid = w[i] > 0
        per_head = np.zeros((heads, fo))
        for hh in range(heads):
            if valid.any():
                pre = s_l[cols[i], hh] + s_r[self_idx[i], hh]
                e = (np.where(pre >= 0, pre, 0.2 * pre) * av[hh]).sum(1)
                e = np.where(valid, e, -np.inf)
                z = np.exp(e - e[valid].max())
                z[~valid] = 0.0
                alpha = z / z.sum()
                per_head[hh] = alpha @ s_l[cols[i], hh]
            else:
                per_head[hh] = s_l[self_idx[i], hh]
        want[i] = per_head.mean(0)  # single layer = last layer: head mean
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_sampled_gatv2_trains():
    """2-layer sampled GATv2 learns SBM labels; tied w_r default works."""
    import optax

    from pygcn_tpu.ops.sampling import SampledBatch, sampled_gatv2_forward

    data = sbm_classification(n=300, n_classes=3, feat_dim=32, seed=0)
    a = data.graph.to_scipy().tocsr()
    sampler = NeighborSampler(a, fanouts=[5, 5], mode="gcn", seed=0)

    heads, fo, ncls = 2, 8, data.n_classes
    ks = jax.random.split(jax.random.key(0), 6)
    params = [
        {"w_l": tinit.graphconv_weight(ks[0], 32, heads * fo),
         "w_r": tinit.graphconv_weight(ks[1], 32, heads * fo),
         "a": tinit.graphconv_weight(ks[2], heads, fo),
         "b": jnp.zeros(heads * fo)},
        # second layer: tied weights (no w_r) exercises the default
        {"w_l": tinit.graphconv_weight(ks[3], heads * fo, 1 * ncls),
         "a": tinit.graphconv_weight(ks[4], 1, ncls),
         "b": jnp.zeros(ncls)},
    ]
    tx = optax.adam(0.01)
    opt_state = tx.init(params)
    x_all = jnp.asarray(data.features)
    y_all = np.asarray(data.labels)

    @jax.jit
    def step(params, opt_state, blocks, input_nodes, y):
        def loss_fn(p):
            b = SampledBatch(blocks=blocks, input_nodes=None, output_nodes=None)
            logits = sampled_gatv2_forward(p, b, x_all[input_nodes])
            logp = jax.nn.log_softmax(logits, axis=1)
            return -jnp.take_along_axis(logp, y[:, None], axis=1).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    for _ in range(40):
        seeds = rng.choice(data.idx_train, size=32, replace=True)
        batch = sampler.sample(seeds, pad=True)
        params, opt_state, loss = step(
            params, opt_state, batch.blocks,
            jnp.asarray(batch.input_nodes), jnp.asarray(y_all[seeds]),
        )
    assert np.isfinite(float(loss))

    eval_batch = sampler.sample(data.idx_test)
    logits = sampled_gatv2_forward(
        params,
        SampledBatch(blocks=eval_batch.blocks, input_nodes=None, output_nodes=None),
        x_all[jnp.asarray(eval_batch.input_nodes)],
    )
    acc = (np.asarray(logits).argmax(1) == y_all[data.idx_test]).mean()
    assert acc > 0.6, acc
