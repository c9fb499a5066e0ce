"""GPipe pipeline parallelism on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from pygcn_tpu.parallel import make_mesh
from pygcn_tpu.parallel.pipeline import (
    PipelinedDeepGCN,
    make_gpipe,
    stack_stage_params,
)


def _sequential(stage_params, stage_fn, x_mbs):
    """Reference: every microbatch through all stages, in order."""
    out = []
    for m in range(x_mbs.shape[0]):
        h = x_mbs[m]
        for p in stage_params:
            h = stage_fn(p, h)
        out.append(h)
    return jnp.stack(out)


def test_gpipe_matches_sequential():
    """4-stage pipeline over 6 microbatches == the sequential loop."""
    rng = np.random.default_rng(0)
    mesh = make_mesh([4], ["pipe"])
    stage_fn = lambda p, h: jnp.tanh(jnp.dot(h, p["w"]) + p["b"])
    stage_params = [
        {"w": jnp.asarray(rng.normal(size=(8, 8), scale=0.5).astype(np.float32)),
         "b": jnp.asarray(rng.normal(size=(8,)).astype(np.float32))}
        for _ in range(4)
    ]
    x = jnp.asarray(rng.normal(size=(6, 3, 8)).astype(np.float32))

    apply = make_gpipe(mesh, stage_fn)
    got = apply(stack_stage_params(stage_params), x)
    want = _sequential(stage_params, stage_fn, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_pipeline_gradients_match():
    """grad through the pipeline == grad through the sequential loop
    (the transposed scan/ppermute IS the reverse pipeline schedule)."""
    rng = np.random.default_rng(1)
    mesh = make_mesh([4], ["pipe"])
    stage_fn = lambda p, h: jnp.tanh(jnp.dot(h, p["w"]))
    stage_params = [
        {"w": jnp.asarray(rng.normal(size=(6, 6), scale=0.5).astype(np.float32))}
        for _ in range(4)
    ]
    stacked = stack_stage_params(stage_params)
    x = jnp.asarray(rng.normal(size=(5, 2, 6)).astype(np.float32))
    apply = make_gpipe(mesh, stage_fn)

    def loss_pipe(sp):
        return (apply(sp, x) ** 2).sum()

    def loss_seq(params):
        return (_sequential(params, stage_fn, x) ** 2).sum()

    g_pipe = jax.grad(loss_pipe)(stacked)
    g_seq = jax.grad(loss_seq)(stage_params)
    g_seq_stacked = stack_stage_params(g_seq)
    np.testing.assert_allclose(
        np.asarray(g_pipe["w"]), np.asarray(g_seq_stacked["w"]),
        rtol=1e-4, atol=1e-5,
    )


def test_pipelined_deep_gcn_matches_loop():
    """PipelinedDeepGCN == unpipelined per-sample GraphConv stack."""
    rng = np.random.default_rng(2)
    n, f, hid, out, batch = 30, 5, 8, 2, 8
    a = rng.uniform(size=(n, n)).astype(np.float32)
    a = (a + a.T) / (2 * n)
    mesh = make_mesh([4], ["pipe"])
    model = PipelinedDeepGCN(mesh, a, f, hid, out)
    params = model.init(jax.random.key(0))

    x = jnp.asarray(rng.normal(size=(batch, n, f)).astype(np.float32))
    got = model.apply(model.shard_params(params), x, microbatch=2)

    conv = lambda p, h: jnp.einsum("ij,bjh->bih", a, jnp.dot(h, p["w"])) + p["b"]
    h = jax.nn.relu(conv(params["pre"], x))
    for s in range(model.n_stages):
        p = jax.tree.map(lambda l: l[s], params["stages"])
        h = jax.nn.relu(conv(p, h))
    want = conv(params["head"], h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_gpipe_stage_grouping_and_mismatch():
    """8 stages on a 4-device pipe run as 2 consecutive stages per device;
    non-multiple stage counts are rejected (regression: a[0] silently
    dropped all but each device's first stage)."""
    rng = np.random.default_rng(3)
    mesh = make_mesh([4], ["pipe"])
    stage_fn = lambda p, h: jnp.tanh(jnp.dot(h, p["w"]))
    stage_params = [
        {"w": jnp.asarray(rng.normal(size=(5, 5), scale=0.4).astype(np.float32))}
        for _ in range(8)
    ]
    x = jnp.asarray(rng.normal(size=(5, 2, 5)).astype(np.float32))
    apply = make_gpipe(mesh, stage_fn)
    got = apply(stack_stage_params(stage_params), x)
    want = _sequential(stage_params, stage_fn, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)

    import pytest
    with pytest.raises(ValueError, match="multiple"):
        apply(stack_stage_params(stage_params[:6]), x)
