"""Orbax distributed checkpointing: sharded save, elastic reshard-restore."""

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from pygcn_tpu.parallel import make_mesh
from pygcn_tpu.train.checkpoint_orbax import OrbaxCheckpointer


def _sds(shape, dtype, sharding):
    return jax.ShapeDtypeStruct(shape, dtype, sharding=sharding)


def test_orbax_elastic_roundtrip(tmp_path):
    """Save sharded on 8 devices, restore directly into a 4-device mesh."""
    mesh8 = make_mesh([8], ["graph"])
    x = jax.device_put(
        jnp.arange(64.0, dtype=jnp.float32).reshape(8, 8),
        NamedSharding(mesh8, P("graph")),
    )
    tree = {"params": [{"w": x, "b": jnp.ones(3)}], "epoch": jnp.asarray(7)}

    path = os.path.join(str(tmp_path), "ckpt")
    ck = OrbaxCheckpointer()  # async
    ck.save(path, tree)

    mesh4 = make_mesh([4], ["graph"], devices=jax.devices()[:4])
    repl4 = NamedSharding(mesh4, P())
    like = {
        "params": [{
            "w": _sds((8, 8), jnp.float32, NamedSharding(mesh4, P("graph"))),
            "b": _sds((3,), jnp.float32, repl4),
        }],
        "epoch": _sds((), jnp.int32, repl4),
    }
    back = ck.restore(path, like=like)  # waits for the async save internally
    np.testing.assert_array_equal(np.asarray(back["params"][0]["w"]), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(back["params"][0]["b"]), np.ones(3))
    assert int(back["epoch"]) == 7
    # restored onto the 4-device mesh, still node-sharded
    spec = back["params"][0]["w"].sharding
    assert spec.mesh.shape["graph"] == 4 and spec.spec == P("graph")
    ck.close()


def test_orbax_restore_concrete_like(tmp_path):
    """`like` can be the concrete tree — shardings are lifted from it."""
    mesh = make_mesh([8], ["graph"])
    w = jax.device_put(
        jnp.arange(16.0, dtype=jnp.float32).reshape(8, 2),
        NamedSharding(mesh, P("graph")),
    )
    path = os.path.join(str(tmp_path), "ckpt2")
    ck = OrbaxCheckpointer(async_save=False)
    ck.save(path, {"w": w})
    back = ck.restore(path, like={"w": w})
    np.testing.assert_array_equal(np.asarray(back["w"]), np.asarray(w))
    assert back["w"].sharding == w.sharding
    ck.close()
