"""Policy-parallel simulator fan-out over a device mesh.

The reference evaluates independent vaccination policies by forking a
``multiprocessing.Pool`` of CPU simulator workers with a shared memo cache
(reference ``pygcn/rl-policy-generator.py:308-321``). The TPU-native analog
is a *device mesh*: the policy batch is a sharded leading axis, each chip
runs the vmapped :func:`pygcn_tpu.sim.model.simulate` scan over its local
slice of policies, and no collectives are needed at all — the fan-out is
embarrassingly parallel, exactly like the process pool, but rides a single
SPMD program instead of forked interpreters.

Determinism: each policy's result depends only on its own ``(attack_vac,
key)`` pair, so outputs are bit-identical whether the batch runs on one
device (plain ``vmap``), on an N-device mesh, or split across calls.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pygcn_tpu.sim.model import EpidemicParams, VisitSeq, simulate


def _default_extract(out):
    """Per-policy reduction applied inside the fan-out, keeping the sharded
    output small (full histories are [D, S, N] per policy): the final
    recorded cumulative case/death fields the gt drivers consume
    (reference ``gt-gen-vac-fixed-num-cbgs.py:425-450``)."""
    return {"cases_cbg": out["history_C2"][-1], "deaths_cbg": out["history_D2"][-1]}


# Compiled-program cache. jax.jit keys its own cache on the wrapped function's
# identity, so jitting a fresh closure per call would recompile every call —
# the cache must live at module level, keyed by everything that shapes the
# traced program (mesh layout included; array shapes/dtypes are handled by
# jit's own cache underneath).
_compiled = {}


def simulate_policy_batch(
    params: EpidemicParams,
    visits: VisitSeq,
    attack_vacs: jax.Array,
    keys: jax.Array,
    num_seeds: int,
    *,
    verbosity: int = 24,
    extract: Optional[Callable] = None,
    mesh: Optional[Mesh] = None,
    axis_name: str = "data",
):
    """Simulate a batch of policies — one row of ``attack_vacs`` ([B, N]
    post-vaccination attack rates, the only per-policy parameter) and one
    PRNG key per policy — vmapped on one device, or sharded over
    ``mesh[axis_name]`` when a mesh is given.

    Returns ``extract``'s pytree with a leading B axis. ``B`` need not
    divide the mesh axis: the batch is padded with repeats of row 0 and
    trimmed after.
    """
    extract = extract or _default_extract

    cache_key = (num_seeds, verbosity, extract, mesh, axis_name)
    fn = _compiled.get(cache_key)
    if fn is None:

        def local(params, visits, attack_vacs, keys):
            def one(attack_vac, k):
                p = dataclasses.replace(params, attack_vac=attack_vac)
                return extract(simulate(p, visits, num_seeds, k, verbosity=verbosity))

            return jax.vmap(one)(attack_vacs, keys)

        if mesh is None:
            fn = jax.jit(local)
        else:
            fn = jax.jit(
                shard_map(
                    local,
                    mesh=mesh,
                    # params/visits replicated (explicit args, NOT closure
                    # captures — a captured visit buffer would be baked into
                    # the program as a constant), policy batch + keys sharded
                    # over the mesh axis.
                    in_specs=(P(), P(), P(axis_name), P(axis_name)),
                    out_specs=P(axis_name),
                    # jax.random.binomial's internal while_loop rebuilds carry
                    # components with lax.full_like, which drops the varying-
                    # manual-axes tag and trips the vma type check under
                    # shard_map. The fan-out is embarrassingly parallel (no
                    # collectives), so the replication check adds nothing here.
                    check_vma=False,
                )
            )
        _compiled[cache_key] = fn

    pad = 0
    if mesh is not None:
        n_shards = mesh.shape[axis_name]
        b = attack_vacs.shape[0]
        pad = (-b) % n_shards
        if pad:
            attack_vacs = jnp.concatenate(
                [attack_vacs, jnp.broadcast_to(attack_vacs[:1], (pad,) + attack_vacs.shape[1:])]
            )
            keys = jnp.concatenate([keys, jnp.broadcast_to(keys[:1], (pad,) + keys.shape[1:])])

    out = fn(params, visits, attack_vacs, keys)
    if pad:
        out = jax.tree.map(lambda x: x[:b], out)
    return out
