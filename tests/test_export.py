"""jax.export serving artifacts: round-trip equality, no-model-code reload."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pygcn_tpu.train.export import (
    deserialize_forward,
    export_forward,
    load_artifact,
    save_artifact,
)


def test_export_roundtrip_bitwise():
    """Serialized StableHLO reproduces the jitted forward bit-for-bit."""
    w = jnp.asarray(np.random.default_rng(0).normal(size=(8, 4)).astype(np.float32))

    def fn(x):
        return jax.nn.relu(x @ w).sum(axis=1)

    x = jnp.asarray(np.random.default_rng(1).normal(size=(3, 8)).astype(np.float32))
    blob = export_forward(fn, (x,))
    assert isinstance(blob, bytes) and len(blob) > 0

    loaded = deserialize_forward(blob)
    np.testing.assert_array_equal(np.asarray(fn(x)), np.asarray(loaded(x)))


def test_export_artifact_file_and_meta(tmp_path):
    path = str(tmp_path / "model.shlo")

    def fn(x):
        return x * 2.0 + 1.0

    x = jnp.arange(6, dtype=jnp.float32).reshape(2, 3)
    save_artifact(path, fn, (x,), meta={"batch": 2, "note": "test"})
    loaded, meta = load_artifact(path)
    assert meta["batch"] == 2
    np.testing.assert_array_equal(np.asarray(loaded(x)), np.asarray(fn(x)))


def test_export_artifact_rejects_wrong_file(tmp_path):
    import pickle

    path = str(tmp_path / "junk.pkl")
    with open(path, "wb") as f:
        pickle.dump({"whatever": 1}, f)
    with pytest.raises(ValueError, match="not a pygcn_tpu export artifact"):
        load_artifact(path)


def test_exported_evaluator_matches_model():
    """The flagship evaluator forward survives export (weights+graph baked)."""
    from pygcn_tpu.apps.common import build_synthetic_world
    from pygcn_tpu.nn.models import GCNOverMLP

    world = build_synthetic_world(n_cbgs=24, n_pois=8, hours=24)
    feat, dt, hid = 8, 6, 8
    model = GCNOverMLP(
        gcn_nfeat=dt, gcn_nhid=hid, gcn_nclass=hid, dim_touched=dt,
        linear_nin=hid + (feat - dt) - 1, linear_nhid1=8, linear_nhid2=4,
    )
    params = model.init(jax.random.key(0))
    graph = world.graph

    def fwd(bx):
        return model.apply(params, bx, graph)[:, 0]

    rng = np.random.default_rng(0)
    bx = jnp.asarray(rng.normal(size=(4, 24, feat)).astype(np.float32))
    loaded = deserialize_forward(export_forward(fwd, (bx,)))
    np.testing.assert_array_equal(np.asarray(fwd(bx)), np.asarray(loaded(bx)))
