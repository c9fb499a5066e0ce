"""Expert-parallel MoE MLP on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pygcn_tpu.parallel import make_mesh
from pygcn_tpu.parallel.moe import ExpertParallelMLP, top1_dispatch


def test_top1_dispatch_routes_and_caps():
    logits = jnp.asarray(np.array([
        [9.0, 0.0], [9.0, 0.0], [9.0, 0.0],  # all to expert 0
        [0.0, 9.0],
    ], np.float32))
    dispatch, combine = top1_dispatch(logits, capacity=2)
    assert dispatch.shape == (4, 2, 2)
    # tokens 0,1 fill expert 0's two slots; token 2 overflows and is dropped
    np.testing.assert_array_equal(np.asarray(dispatch[0, 0]), [1, 0])
    np.testing.assert_array_equal(np.asarray(dispatch[1, 0]), [0, 1])
    assert float(dispatch[2].sum()) == 0.0
    np.testing.assert_array_equal(np.asarray(dispatch[3, 1]), [1, 0])
    # combine carries the router probability
    p0 = float(jax.nn.softmax(logits[0])[0])
    np.testing.assert_allclose(float(combine[0, 0, 0]), p0, rtol=1e-6)


def test_expert_parallel_matches_dense_loop():
    """Sharded MoE == per-token argmax-expert reference (ample capacity)."""
    rng = np.random.default_rng(0)
    mesh = make_mesh([4], ["expert"])
    moe = ExpertParallelMLP(mesh, n_experts=4, h=8, hidden=16,
                            capacity_factor=4.0)
    params = moe.init(jax.random.key(0))
    x = jnp.asarray(rng.normal(size=(24, 8)).astype(np.float32))

    got = np.asarray(moe.apply(moe.shard_params(params), x))

    probs = np.asarray(jax.nn.softmax(jnp.dot(x, params["gate"]), axis=1))
    want = np.zeros_like(got)
    for i in range(x.shape[0]):
        e = int(probs[i].argmax())
        h1 = np.maximum(
            np.asarray(x[i]) @ np.asarray(params["w1"][e]) + np.asarray(params["b1"][e]), 0
        )
        out = h1 @ np.asarray(params["w2"][e]) + np.asarray(params["b2"][e])
        want[i] = probs[i, e] * out
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_expert_parallel_trains():
    """Gradients flow through dispatch into experts AND the gate."""
    rng = np.random.default_rng(1)
    mesh = make_mesh([2], ["expert"])
    moe = ExpertParallelMLP(mesh, n_experts=4, h=6, hidden=12)
    params = moe.shard_params(moe.init(jax.random.key(1)))
    x = jnp.asarray(rng.normal(size=(32, 6)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(32, 6)).astype(np.float32))

    @jax.jit
    def loss_fn(p):
        return jnp.mean((x + moe.apply(p, x) - y) ** 2)  # residual MoE

    grad_fn = jax.jit(jax.grad(loss_fn))
    loss0 = float(loss_fn(params))
    grads = grad_fn(params)
    assert float(jnp.abs(grads["gate"]).sum()) > 0.0
    assert float(jnp.abs(grads["w1"]).sum()) > 0.0
    lr = 0.1
    for _ in range(40):
        params = jax.tree.map(lambda p, gi: p - lr * gi, params, grad_fn(params))
    assert float(loss_fn(params)) < loss0


def test_expert_count_must_divide_mesh():
    mesh = make_mesh([4], ["expert"])
    with pytest.raises(ValueError, match="not divisible"):
        ExpertParallelMLP(mesh, n_experts=6, h=8)
