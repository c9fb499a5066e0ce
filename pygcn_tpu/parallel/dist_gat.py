"""Distributed GAT over the edge-partitioned mesh (halo-exchange attention).

Extends the attention family (``nn/gat.py``) to partitioned graphs. The key
structural fact: ``build_dist_plan`` partitions edges BY RECEIVER, so every
receiver's full incoming edge set lives on its owner shard — the edge
softmax is **entirely shard-local**. Only sender-side data crosses the mesh:
one halo exchange ships ``[s | logit_src]`` rows (features and source logits
concatenated — a single tiled all_to_all, same plan/one collective as the
distributed SpMM in ``dist_spmm.py``), and the local softmax/aggregation
runs over the shard's local + halo edge arrays.

Weights are replicated (like ``DistGCN``); XLA inserts the gradient
all-reduces and the reverse halo exchange under ``jit``.

``v2=True`` switches both classes to GATv2 (dynamic attention): the halo
ships the source transform ``s_l`` alone — v2 logits
``a · leaky_relu(s_l[u] + s_r[v])`` are computed receiver-side from the
shipped features plus the local receiver transform, so v2 actually moves
*fewer* bytes per halo row than v1's ``[s | logit_src]`` packing.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pygcn_tpu.nn import init as tinit
from pygcn_tpu.parallel.dist_spmm import pad_node_features
from pygcn_tpu.parallel.partition import DistPlan


class DistGATConv:
    """One multi-head GAT layer over a ``graph``-sharded node axis.

    ``apply(params, x)``: ``x`` [N_pad, F] sharded ``P(graph)`` →
    [N_pad, heads*out] (concat) or [N_pad, out] (mean), same sharding.
    """

    def __init__(
        self,
        mesh: Mesh,
        plan: DistPlan,
        in_features: int,
        out_features: int,
        heads: int = 1,
        concat: bool = True,
        negative_slope: float = 0.2,
        axis: str = "graph",
        v2: bool = False,
    ):
        self.mesh = mesh
        self.plan = plan
        self.in_features = in_features
        self.out_features = out_features
        self.heads = heads
        self.concat = concat
        self.negative_slope = negative_slope
        self.axis = axis
        self.v2 = v2
        # plan edge arrays are zero-padded per shard; padding rows carry
        # weight 0 while real (normalized-adjacency) edges are > 0 — GAT
        # only needs connectivity, so the weights become validity masks
        self.valid_loc = jnp.asarray(
            (np.asarray(plan.loc_w) != 0).astype(np.float32)
        )  # [P, E_loc]
        self.valid_rem = jnp.asarray(
            (np.asarray(plan.rem_w) != 0).astype(np.float32)
        )
        self._sharded = self._build_shard_fn()

    def init(self, key):
        kw, ks, kd, kb = jax.random.split(key, 4)
        h, f = self.heads, self.out_features
        out_dim = h * f if self.concat else f
        if self.v2:
            return {
                "w_l": tinit.graphconv_weight(kw, self.in_features, h * f),
                "w_r": tinit.graphconv_weight(kd, self.in_features, h * f),
                "a": tinit.graphconv_weight(ks, h, f),
                "b": tinit.graphconv_bias(kb, out_dim),
            }
        return {
            "w": tinit.graphconv_weight(kw, self.in_features, h * f),
            "a_src": tinit.graphconv_weight(ks, h, f),
            "a_dst": tinit.graphconv_weight(kd, h, f),
            "b": tinit.graphconv_bias(kb, out_dim),
        }

    def _build_shard_fn(self):
        plan, axis = self.plan, self.axis
        h, f = self.heads, self.out_features
        S = plan.shard_size
        slope = self.negative_slope
        v2 = self.v2

        def local_fn(table, recv_tab, loc, rem, send_idx, valid_loc,
                     valid_rem, a_vec):
            # leading shard axis collapsed to 1 by shard_map
            loc_s, loc_r = (a[0] for a in loc)
            rem_h, rem_r = (a[0] for a in rem)
            vloc = valid_loc[0][:, None]  # [E_loc, 1]
            vrem = valid_rem[0][:, None]
            send_idx = send_idx[0]  # [P, halo]
            # table/recv_tab specs split the node axis: locals are [S, ...]

            # one halo exchange ships sender rows: v1 packs [s2 | lsrc];
            # v2 ships s_l2 alone (its logits are computed receiver-side
            # from the shipped features — nothing extra crosses the mesh)
            outgoing = jnp.take(table, send_idx.reshape(-1), axis=0).reshape(
                send_idx.shape[0], send_idx.shape[1], table.shape[1]
            )
            halo = jax.lax.all_to_all(
                outgoing, axis, split_axis=0, concat_axis=0, tiled=True
            ).reshape(-1, table.shape[1])
            if v2:
                s2_halo, s2_loc = halo, table
                src_loc, src_rem = s2_loc, s2_halo

                def logits(s_tab, senders, receivers, valid):
                    # recv_tab = s_r2 [S, h*f]; a · leaky_relu(s_l[u]+s_r[v]).
                    # The per-head contraction runs as ONE flat [E, h*f] @
                    # [h*f, h] matmul (kron sum-selector) instead of an
                    # einsum over an [E, h, f] tensor whose trailing f=8
                    # pays 16x lane padding (the round-2 64-lane lesson).
                    g = jnp.take(s_tab, senders, axis=0)
                    d = jnp.take(recv_tab, receivers, axis=0)
                    pre = jax.nn.leaky_relu(g + d, slope)  # [E, h*f]
                    ksel = jnp.kron(jnp.eye(h, dtype=pre.dtype),
                                    jnp.ones((f, 1), pre.dtype))
                    e = jnp.dot(pre * a_vec.reshape(-1), ksel,
                                preferred_element_type=pre.dtype)  # [E, h]
                    return jnp.where(valid > 0, e, -jnp.inf)
            else:
                s2_halo, lsrc_halo = halo[:, : h * f], halo[:, h * f :]
                s2_loc, lsrc_loc = table[:, : h * f], table[:, h * f :]
                src_loc, src_rem = lsrc_loc, lsrc_halo

                def logits(lsrc_tab, senders, receivers, valid):
                    # recv_tab = ldst [S, h]
                    e = jax.nn.leaky_relu(
                        jnp.take(lsrc_tab, senders, axis=0)
                        + jnp.take(recv_tab, receivers, axis=0),
                        slope,
                    )
                    return jnp.where(valid > 0, e, -jnp.inf)

            e_loc = logits(src_loc, loc_s, loc_r, vloc)  # [E_loc, h]
            e_rem = logits(src_rem, rem_h, rem_r, vrem)

            m = jnp.maximum(
                jax.ops.segment_max(e_loc, loc_r, num_segments=S),
                jax.ops.segment_max(e_rem, rem_r, num_segments=S),
            )
            m = jnp.where(jnp.isfinite(m), m, 0.0)  # [S, h]
            ex_loc = jnp.exp(e_loc - jnp.take(m, loc_r, axis=0)) * vloc
            ex_rem = jnp.exp(e_rem - jnp.take(m, rem_r, axis=0)) * vrem
            denom = jnp.maximum(
                jax.ops.segment_sum(ex_loc, loc_r, num_segments=S)
                + jax.ops.segment_sum(ex_rem, rem_r, num_segments=S),
                1e-16,
            )

            def aggregate(ex, s2_tab, senders, receivers):
                alpha = ex / jnp.take(denom, receivers, axis=0)  # [E, h]
                g = jnp.take(s2_tab, senders, axis=0)  # [E, h*f]
                # f-replicate alpha and multiply FLAT: the [E, h, f] form's
                # trailing f=8 pays 16x lane padding (round-2 lesson)
                w = g * jnp.repeat(alpha, f, axis=-1)
                return jax.ops.segment_sum(w, receivers, num_segments=S)

            return aggregate(ex_loc, s2_loc, loc_s, loc_r) + aggregate(
                ex_rem, s2_halo, rem_h, rem_r
            )

        loc = (plan.loc_s, plan.loc_r)
        rem = (plan.rem_h, plan.rem_r)
        e_spec = (P(axis, None), P(axis, None))
        fn = shard_map(
            local_fn,
            mesh=self.mesh,
            in_specs=(P(axis, None), P(axis, None), e_spec, e_spec,
                      P(axis, None, None), P(axis, None), P(axis, None),
                      P()),
            out_specs=P(axis, None),
        )

        def run(table, recv_tab, a_vec):
            return fn(table, recv_tab, loc, rem, plan.send_idx,
                      self.valid_loc, self.valid_rem, a_vec)

        return run

    def apply(self, params, x: jax.Array) -> jax.Array:
        h, f = self.heads, self.out_features
        if self.v2:
            s_l2 = jnp.dot(x, params["w_l"])  # [N_pad, h*f], row-sharded
            s_r2 = jnp.dot(x, params["w_r"])
            out = self._sharded(s_l2, s_r2, params["a"])
        else:
            s2 = jnp.dot(x, params["w"])  # [N_pad, h*f], row-sharded
            s3 = s2.reshape(x.shape[0], h, f)
            lsrc = jnp.einsum("nhf,hf->nh", s3, params["a_src"])
            ldst = jnp.einsum("nhf,hf->nh", s3, params["a_dst"])
            out = self._sharded(
                jnp.concatenate([s2, lsrc], axis=1), ldst,
                jnp.zeros((h, f), s2.dtype),
            )
        if not self.concat:
            out = out.reshape(x.shape[0], h, f).mean(axis=1)
        return out + params["b"]


class DistGAT:
    """2-layer distributed GAT classifier (mirrors ``nn.gat.GAT``):
    ``elu(gat1: heads, concat) → gat2: out_heads, mean → log_softmax``."""

    def __init__(
        self,
        mesh: Mesh,
        plan: DistPlan,
        nfeat: int,
        nhid: int,
        nclass: int,
        heads: int = 8,
        out_heads: int = 1,
        negative_slope: float = 0.2,
        axis: str = "graph",
        v2: bool = False,
    ):
        self.mesh = mesh
        self.plan = plan
        self.axis = axis
        self.gat1 = DistGATConv(
            mesh, plan, nfeat, nhid, heads=heads, concat=True,
            negative_slope=negative_slope, axis=axis, v2=v2,
        )
        self.gat2 = DistGATConv(
            mesh, plan, nhid * heads, nclass, heads=out_heads, concat=False,
            negative_slope=negative_slope, axis=axis, v2=v2,
        )

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"gat1": self.gat1.init(k1), "gat2": self.gat2.init(k2)}

    def apply(self, params, x: jax.Array) -> jax.Array:
        x = jax.nn.elu(self.gat1.apply(params["gat1"], x))
        x = self.gat2.apply(params["gat2"], x)
        return jax.nn.log_softmax(x, axis=1)

    def shard_params(self, params):
        return jax.device_put(params, NamedSharding(self.mesh, P()))

    def shard_x(self, x):
        x = pad_node_features(jnp.asarray(x), self.plan)
        return jax.device_put(x, NamedSharding(self.mesh, P(self.axis, None)))
