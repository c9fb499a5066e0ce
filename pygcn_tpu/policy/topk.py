"""Differentiable policy optimization against a frozen surrogate evaluator.

Rebuilds the training core of the reference's ``policy-generator.py`` /
``hierarchical-policy-generator.py``: the generator emits a (straight-through)
top-K vaccination flag, the flag is spliced into the evaluator's feature
layout, and the frozen evaluator's scalar prediction *is* the loss — gradients
flow through the frozen evaluator into the generator
(reference ``pygcn/policy-generator.py:384-428``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def make_generator_train_step(
    generator,
    evaluator,
    evaluator_params,
    optimizer: optax.GradientTransformation,
    graph,
    eval_base_feats: jax.Array,
):
    """Returns jitted ``step(gen_params, opt_state, gen_feats) ->
    (gen_params, opt_state, loss, vac_flag)``.

    ``eval_base_feats``: [N, F_eval - 1] — the evaluator feature block minus
    the trailing vac flag (the duplicated demographics+centrality layout the
    reference assembles at ``policy-generator.py:398-399``).
    """

    def loss_fn(gen_params, gen_feats):
        vac_flag = generator.apply(gen_params, gen_feats, graph)  # [N, 1]
        eval_feats = jnp.concatenate([eval_base_feats, vac_flag], axis=1)[None]
        pred = evaluator.apply(evaluator_params, eval_feats, graph)
        return pred.sum(), vac_flag

    @jax.jit
    def step(gen_params, opt_state, gen_feats):
        (loss, vac_flag), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            gen_params, gen_feats
        )
        updates, opt_state = optimizer.update(grads, opt_state, gen_params)
        gen_params = optax.apply_updates(gen_params, updates)
        return gen_params, opt_state, loss, vac_flag

    return step


def extract_policy(vac_flag) -> Tuple[int, ...]:
    """Nonzero-flag node indices as a hashable policy key
    (reference ``policy-generator.py:389``)."""
    return tuple(np.nonzero(np.asarray(vac_flag).ravel())[0].tolist())


def policy_to_vaccination_vector(
    policy, n_cbgs: int, num_vaccines_per_cbg: float
) -> np.ndarray:
    """Policy indices → per-CBG vaccine counts
    (reference ``traditional_evaluate``, ``policy-generator.py:210-221``)."""
    v = np.zeros(n_cbgs)
    v[np.asarray(policy, np.int64)] = num_vaccines_per_cbg
    return v
