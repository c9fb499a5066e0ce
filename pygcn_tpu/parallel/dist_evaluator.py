"""Distributed surrogate evaluator over a 2-D ``graph x data`` mesh.

Composes the two parallelism axes this workload has:

- **graph axis** (the build's TP/SP analog): nodes are edge-partitioned with
  halo exchange; each SpMM runs through ``make_dist_spmm`` (shard_map +
  all_to_all over ICI).
- **data axis** (DP): the batch of policy samples is sharded; the per-layer
  wide-GEMM folds the batch into SpMM columns, so batch sharding becomes
  *column* sharding of the very same SpMM — the two axes compose inside one
  product instead of nesting loops.

Everything outside the SpMM (dense GEMMs, standardization, pooling, the MLP
head) is plain jnp under jit: GSPMD propagates the 2-D shardings and inserts
the cross-axis reductions (pool sums over graph shards, gradient all-reduces
over both axes) automatically.

Semantics mirror the single-device ``GCNOverMLP`` (reference ``GCN_OVER_MLP``,
``pygcn/models.py:333-355``) exactly on real rows; padded rows (node-count
rounding from the partition plan) are excluded from the standardization
statistics and the masked pool, so distributed == single-device to float
tolerance (pinned by ``tests/test_dist_gcn.py``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pygcn_tpu.nn.layers import masked_mean_pool
from pygcn_tpu.nn.models import GCNOverMLP
from pygcn_tpu.parallel.dist_spmm import make_dist_spmm, pad_node_features
from pygcn_tpu.parallel.partition import DistPlan


def masked_batch_standardize(
    x: jax.Array, valid: jax.Array, eps: float = 1e-5
) -> jax.Array:
    """``batch_standardize`` over the node axis with padded rows masked out.

    ``x``: [..., N_pad, H]; ``valid``: [N_pad] ∈ {0,1}. Statistics use only
    valid rows, so results on valid rows match the unpadded computation
    (reference fresh-BatchNorm quirk, ``pygcn/models.py:41-45``). Padded rows
    get garbage values — harmless: they have no edges and are masked out of
    the pool.
    """
    n = jnp.maximum(valid.sum(), 1.0)
    v = valid[:, None]
    mean = (x * v).sum(axis=-2, keepdims=True) / n
    d = (x - mean) * v
    var = (d * d).sum(axis=-2, keepdims=True) / n
    return (x - mean) * jax.lax.rsqrt(var + eps)


class DistGCNOverMLP:
    """GCNOverMLP with nodes sharded over ``graph`` and batch over ``data``.

    Parameter pytree is identical to the single-device ``GCNOverMLP`` (init
    is delegated), so checkpoints swap freely between the two.
    """

    def __init__(
        self,
        mesh: Mesh,
        plan: DistPlan,
        *,
        gcn_nfeat: int,
        gcn_nhid: int,
        gcn_nclass: int,
        dim_touched: int,
        linear_nin: int,
        linear_nhid1: int,
        linear_nhid2: int,
        linear_nout: int = 1,
        axis_graph: str = "graph",
        axis_data: str = "data",
    ):
        self.mesh = mesh
        self.plan = plan
        self.dim_touched = dim_touched
        self.axis_graph = axis_graph
        self.axis_data = axis_data
        self.spmm = make_dist_spmm(mesh, plan, axis_graph, col_axis=axis_data)
        self._ref = GCNOverMLP(
            gcn_nfeat=gcn_nfeat, gcn_nhid=gcn_nhid, gcn_nclass=gcn_nclass,
            dim_touched=dim_touched, linear_nin=linear_nin,
            linear_nhid1=linear_nhid1, linear_nhid2=linear_nhid2,
            linear_nout=linear_nout,
        )
        # {0,1} validity of each padded node row (the plan pads N up to P*S)
        valid = np.zeros(plan.n_nodes_padded, np.float32)
        valid[: plan.n_nodes] = 1.0
        self.valid = jax.device_put(
            jnp.asarray(valid), NamedSharding(mesh, P(axis_graph))
        )

    def init(self, key):
        return self._ref.init(key)

    def _wide_spmm(self, support: jax.Array) -> jax.Array:
        """[B, N_pad, H] → A @ support per sample, via one wide SpMM.

        The fold moves the (data-sharded) batch axis into SpMM columns:
        [N_pad, B·H] sharded P(graph, data) — node rows ride the halo
        exchange, batch columns stay put.
        """
        b, npad, h = support.shape
        wide = jnp.transpose(support, (1, 0, 2)).reshape(npad, b * h)
        agg = self.spmm(wide)
        return jnp.transpose(agg.reshape(npad, b, h), (1, 0, 2))

    def apply(self, params, x: jax.Array) -> jax.Array:
        """``x``: [B, N_pad, F] sharded P(data, graph, ·) → [B, linear_nout]."""
        gp = params["gcn"]
        h = x[:, :, : self.dim_touched]
        # gc1, gc2: conv → ReLU → masked standardize ; gc3: conv → ReLU
        h = self._wide_spmm(jnp.dot(h, gp["gc1"]["w"])) + gp["gc1"]["b"]
        h = masked_batch_standardize(jax.nn.relu(h), self.valid)
        h = self._wide_spmm(jnp.dot(h, gp["gc2"]["w"])) + gp["gc2"]["b"]
        h = masked_batch_standardize(jax.nn.relu(h), self.valid)
        h = jax.nn.relu(self._wide_spmm(jnp.dot(h, gp["gc3"]["w"])) + gp["gc3"]["b"])

        h = jnp.concatenate([h, x[:, :, self.dim_touched :]], axis=2)
        # reference PoolLayer; padded rows have flag 0, so the shared
        # single-device implementation applies unchanged
        pooled = jax.vmap(masked_mean_pool)(h)

        mp = params["mlp"]
        z = jax.nn.relu(jnp.dot(pooled, mp["linear1"]["w"]) + mp["linear1"]["b"])
        z = jax.nn.relu(jnp.dot(z, mp["linear2"]["w"]) + mp["linear2"]["b"])
        return jnp.dot(z, mp["linear3"]["w"]) + mp["linear3"]["b"]

    # ---- sharding helpers -------------------------------------------------
    def shard_params(self, params):
        return jax.device_put(params, NamedSharding(self.mesh, P()))

    def shard_batch(self, x: jax.Array) -> jax.Array:
        """[B, N, F] → padded + sharded P(data, graph, ·)."""
        x = jnp.asarray(x)
        pad = self.plan.n_nodes_padded - x.shape[1]
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        return jax.device_put(
            x, NamedSharding(self.mesh, P(self.axis_data, self.axis_graph, None))
        )

    def shard_targets(self, y: jax.Array) -> jax.Array:
        return jax.device_put(
            jnp.asarray(y), NamedSharding(self.mesh, P(self.axis_data))
        )


def make_dist_evaluator_step(model: DistGCNOverMLP, optimizer):
    """Jitted fused MSE train step over the 2-D mesh (grads auto-reduced)."""

    def loss_fn(params, bx, by):
        pred = model.apply(params, bx)[:, 0]
        return jnp.mean((pred - by) ** 2)

    @jax.jit
    def step(params, opt_state, bx, by):
        loss, grads = jax.value_and_grad(loss_fn)(params, bx, by)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step
