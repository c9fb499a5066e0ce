"""Expert parallelism: top-1-gated mixture-of-experts MLP over an ``expert`` axis.

Completes the parallelism matrix (graph/SP, data/DP, model/TP, pipe/PP live in
their sibling modules; the reference is single-device, ``pygcn/train.py:30``).
The classic dense-dispatch EP formulation, TPU-idiomatic throughout:

- **gating**: softmax router, top-1 expert per token (here: per node), with a
  fixed per-expert capacity so every shape is static under jit; overflow
  tokens are dropped (their output is zero — pair with a residual connection).
- **dispatch/combine** are one-hot einsums (MXU-friendly, no scatter); the
  combine is weighted by the router probability, which is what routes
  gradients back into the gate (straight-through-free top-1 training, as in
  Switch Transformers).
- **expert compute** runs under ``shard_map`` over the ``"expert"`` mesh
  axis: expert-stacked weights ``[E, ...]`` and dispatched inputs
  ``[E, C, H]`` are both sharded ``P("expert")``, so each device runs exactly
  its resident experts with zero weight replication; the dispatch/combine
  einsums outside carry the activations through XLA-inserted collectives.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pygcn_tpu.nn import init as tinit


def top1_dispatch(gate_logits: jax.Array, capacity: int):
    """[N, E] router logits → (dispatch [N, E, C], combine [N, E, C]).

    ``dispatch`` is a {0,1} one-hot routing tensor (token n → slot c of its
    argmax expert e, 0 if the expert is over capacity); ``combine`` is
    ``dispatch * p(e|n)`` so the output mix is differentiable in the gate.
    """
    n, e = gate_logits.shape
    probs = jax.nn.softmax(gate_logits, axis=1)
    expert = jnp.argmax(probs, axis=1)  # [N]
    onehot = jax.nn.one_hot(expert, e, dtype=gate_logits.dtype)  # [N, E]
    # position of each token within its expert's queue (first come first in)
    pos = jnp.cumsum(onehot, axis=0) - onehot  # [N, E] float positions
    keep = onehot * (pos < capacity)
    slot = jax.nn.one_hot(pos.astype(jnp.int32), capacity, dtype=gate_logits.dtype)
    dispatch = keep[:, :, None] * slot  # [N, E, C]
    top_p = (probs * onehot).sum(axis=1)  # p of the chosen expert
    combine = dispatch * top_p[:, None, None]
    return dispatch, combine


class ExpertParallelMLP:
    """Two-layer ReLU MLP experts, one shard of experts per device.

    ``apply(params, x)``: [N, H] → [N, H]. Dropped (over-capacity) tokens
    produce zeros — callers add this as a residual branch.
    """

    def __init__(
        self,
        mesh: Mesh,
        n_experts: int,
        h: int,
        hidden: int | None = None,
        capacity_factor: float = 1.25,
        axis: str = "expert",
    ):
        if n_experts % mesh.shape[axis] != 0:
            raise ValueError(
                f"n_experts {n_experts} not divisible by mesh axis "
                f"'{axis}' size {mesh.shape[axis]}"
            )
        self.mesh = mesh
        self.axis = axis
        self.n_experts = n_experts
        self.h = h
        self.hidden = hidden or 4 * h
        self.capacity_factor = capacity_factor

        def expert_fn(p, xin):  # per device: [E_local, C, H]
            h1 = jax.nn.relu(
                jnp.einsum("ech,ehf->ecf", xin, p["w1"]) + p["b1"][:, None, :]
            )
            return jnp.einsum("ecf,efh->ech", h1, p["w2"]) + p["b2"][:, None, :]

        self._expert_fn = expert_fn

    def init(self, key):
        kg, k1, k2 = jax.random.split(key, 3)
        e, h, f = self.n_experts, self.h, self.hidden
        return {
            "gate": tinit.graphconv_weight(kg, h, e),
            "w1": jnp.stack([
                tinit.graphconv_weight(k, h, f)
                for k in jax.random.split(k1, e)
            ]),
            "b1": jnp.zeros((e, f)),
            "w2": jnp.stack([
                tinit.graphconv_weight(k, f, h)
                for k in jax.random.split(k2, e)
            ]),
            "b2": jnp.zeros((e, h)),
        }

    def param_specs(self):
        a = self.axis
        return {
            "gate": P(),
            "w1": P(a), "b1": P(a), "w2": P(a), "b2": P(a),
        }

    def shard_params(self, params):
        return jax.tree.map(
            lambda leaf, s: jax.device_put(leaf, NamedSharding(self.mesh, s)),
            params, self.param_specs(),
        )

    def capacity(self, n_tokens: int) -> int:
        per = self.capacity_factor * n_tokens / self.n_experts
        return max(1, int(-(-per // 1)))  # ceil

    def apply(self, params, x: jax.Array) -> jax.Array:
        n = x.shape[0]
        c = self.capacity(n)
        dispatch, combine = top1_dispatch(jnp.dot(x, params["gate"]), c)
        expert_in = jnp.einsum("nec,nh->ech", dispatch, x)  # [E, C, H]

        ep = {k: params[k] for k in ("w1", "b1", "w2", "b2")}
        a = self.axis
        run = shard_map(
            self._expert_fn,
            mesh=self.mesh,
            in_specs=(jax.tree.map(lambda _: P(a), ep), P(a)),
            out_specs=P(a),
        )
        expert_out = run(ep, expert_in)
        return jnp.einsum("nec,ech->nh", combine, expert_out)
