"""Pipeline parallelism: GPipe-style microbatch streaming over a ``pipe`` axis.

The reference is single-device (``pygcn/train.py:30``); this adds the PP axis
to the parallelism matrix (graph/SP in ``dist_spmm``, DP in
``dist_evaluator``, TP in ``tp_gcn``). Idiomatic TPU formulation: a
``shard_map`` over the ``"pipe"`` mesh axis holds one stage's weights per
device, and a ``lax.scan`` streams microbatches through the pipeline with one
``ppermute`` per tick — stage ``d`` computes microbatch ``t - d`` at tick
``t``, so all stages run concurrently after the fill bubble (the classic
GPipe schedule; fill+drain overhead is ``(S-1)/(M+S-1)``).

Stages must be homogeneous (same params structure, activation shape preserved)
— exactly the deep-GCN middle: a stack of ``H -> H`` GraphConv layers.
Heterogeneous ends (input projection ``F -> H``, classifier head ``H -> C``)
run replicated outside the pipe, where they are a negligible fraction of the
FLOPs.

Backward needs no extra code: the transpose of ``ppermute`` is the reverse
permutation and ``lax.scan`` transposes to the reversed scan, so
``jax.grad`` through ``gpipe_apply`` IS the reverse pipeline schedule
(gradients stream back stage-by-stage; pinned by
``tests/test_pipeline.py::test_pipeline_gradients_match``).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pygcn_tpu.nn import init as tinit


def make_gpipe(
    mesh: Mesh,
    stage_fn: Callable,
    axis: str = "pipe",
):
    """Build ``apply(stacked_params, x) -> y`` running stages over ``axis``.

    - ``stage_fn(params, h) -> h`` must preserve ``h``'s shape (homogeneous
      pipeline); ``params`` is one stage's pytree.
    - ``stacked_params``: the stages' pytrees stacked on a new leading axis
      (see :func:`stack_stage_params`). The stage count must be a multiple
      ``L*S`` of the mesh-axis size ``S``; each device then runs its ``L``
      consecutive stages per tick (stage grouping).
    - ``x``: ``[M, mb, ...]`` microbatched input, replicated.
    - returns ``[M, mb, ...]``: every microbatch through all S stages, in
      order — identical math to ``for p in stages: h = stage_fn(p, h)``.
    """
    S = mesh.shape[axis]
    perm = [(i, (i + 1) % S) for i in range(S)]

    def pipeline(params, x):
        # per-device slice: leaves [L, ...] = this device's L consecutive
        # stages (stage grouping when total stages = L * mesh size)
        n_local = jax.tree.leaves(params)[0].shape[0]
        d = lax.axis_index(axis)
        M = x.shape[0]

        def device_stages(h):
            for j in range(n_local):
                h = stage_fn(jax.tree.map(lambda a: a[j], params), h)
            return h

        # the carry becomes device-varying after axis_index/ppermute, so the
        # initial value must be cast to varying for the scan types to match
        h0 = lax.pcast(jnp.zeros_like(x[0]), (axis,), to="varying")
        out0 = lax.pcast(jnp.zeros_like(x), (axis,), to="varying")

        def tick(carry, t):
            h_recv, out = carry
            # stage 0 injects microbatch t (clamped during drain; the extra
            # in-flight results land past the scan horizon and are dropped),
            # later stages consume what the previous stage sent last tick
            xin = lax.dynamic_index_in_dim(
                x, jnp.clip(t, 0, M - 1), axis=0, keepdims=False
            )
            h_in = jnp.where(d == 0, xin, h_recv)
            y = device_stages(h_in)
            h_next = lax.ppermute(y, axis, perm)
            # the last stage commits finished microbatch t-(S-1); earlier
            # ticks write warm-up garbage into slot 0, overwritten at
            # t = S-1 by the true first result (writes are in tick order)
            out = lax.dynamic_update_index_in_dim(
                out, y, jnp.clip(t - (S - 1), 0, M - 1), 0
            )
            return (h_next, out), None

        (_, out), _ = lax.scan(tick, (h0, out0), jnp.arange(M + S - 1))
        # [1, M, mb, ...] per device; out_specs P(axis) concatenates to
        # [S, M, mb, ...] and only the last stage's block is the answer
        return out[None]

    def apply(stacked_params, x):
        n_stages = jax.tree.leaves(stacked_params)[0].shape[0]
        if n_stages % S != 0:
            raise ValueError(
                f"stacked stage count {n_stages} must be a multiple of the "
                f"'{axis}' mesh axis size {S}"
            )
        specs = jax.tree.map(lambda _: P(axis), stacked_params)
        fn = shard_map(pipeline, mesh=mesh, in_specs=(specs, P()), out_specs=P(axis))
        return fn(stacked_params, x)[-1]

    return apply


def stack_stage_params(stage_params: Sequence) -> object:
    """Stack S per-stage pytrees (same structure) on a new leading axis."""
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *stage_params)


class PipelinedDeepGCN:
    """Deep GCN with its ``H -> H`` middle layers pipeline-parallel.

    ``pre`` (``F -> H``) and ``head`` (``H -> C``) GraphConv layers run
    replicated; the ``n_stages`` middle layers (one per ``pipe`` device)
    stream microbatches. The adjacency is dense ``[N, N]`` (the flagship
    co-visitation graphs are dense; reference ``pygcn/utils.py:124-129``)
    and replicated. Batch semantics are per-sample GCN over a shared graph,
    exactly ``GCN_OVER_MLP``'s inner loop (reference ``pygcn/models.py:343``).
    """

    def __init__(
        self,
        mesh: Mesh,
        adj: jax.Array,
        f_in: int,
        hidden: int,
        n_out: int,
        axis: str = "pipe",
    ):
        self.mesh = mesh
        self.axis = axis
        self.n_stages = mesh.shape[axis]
        self.adj = jnp.asarray(adj)
        self.f_in, self.hidden, self.n_out = f_in, hidden, n_out

        adj_c = self.adj

        def stage_fn(p, h):  # h: [mb, N, H]
            return jax.nn.relu(
                jnp.einsum("ij,bjh->bih", adj_c, jnp.dot(h, p["w"])) + p["b"]
            )

        self._gpipe = make_gpipe(mesh, stage_fn, axis)

    def init(self, key):
        ks = jax.random.split(key, self.n_stages + 2)
        mk = lambda k, fi, fo: {
            "w": tinit.graphconv_weight(k, fi, fo),
            "b": tinit.graphconv_bias(jax.random.fold_in(k, 1), fo),
        }
        return {
            "pre": mk(ks[0], self.f_in, self.hidden),
            "stages": stack_stage_params(
                [mk(k, self.hidden, self.hidden) for k in ks[1:-1]]
            ),
            "head": mk(ks[-1], self.hidden, self.n_out),
        }

    def shard_params(self, params):
        specs = {
            "pre": jax.tree.map(lambda _: P(), params["pre"]),
            "stages": jax.tree.map(lambda _: P(self.axis), params["stages"]),
            "head": jax.tree.map(lambda _: P(), params["head"]),
        }
        return jax.tree.map(
            lambda leaf, s: jax.device_put(leaf, NamedSharding(self.mesh, s)),
            params, specs,
        )

    def apply(self, params, x, microbatch: int):
        """``x``: [B, N, F] with ``B % microbatch == 0`` → [B, N, n_out]."""
        b, n, _ = x.shape
        assert b % microbatch == 0, (b, microbatch)
        conv = lambda p, h: jnp.einsum(
            "ij,bjh->bih", self.adj, jnp.dot(h, p["w"])
        ) + p["b"]
        h = jax.nn.relu(conv(params["pre"], x))
        mbs = h.reshape(b // microbatch, microbatch, n, self.hidden)
        h = self._gpipe(params["stages"], mbs).reshape(b, n, self.hidden)
        return conv(params["head"], h)
