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
        batch = sampler.sample(seeds)
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
