"""Training metrics, all jit-able.

Mirrors the reference's metric set: MSE train/val/test loss
(``pygcn/gnn-over-mlp.py:309,327,361``), classification accuracy
(``pygcn/utils.py:400-404``), Spearman rank correlation
(``scipy.stats.spearmanr`` at ``pygcn/gnn-over-mlp.py:331,366``) — the Spearman
here is a pure-JAX rank transform + Pearson, so it runs on-device inside the
eval step instead of crossing to host SciPy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean((pred - target) ** 2)


def accuracy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Argmax match rate (reference ``accuracy``, ``pygcn/utils.py:400-404``)."""
    return jnp.mean(jnp.argmax(logits, axis=1) == labels)


def _ranks(x: jax.Array) -> jax.Array:
    """Average ranks (ties get the mean of their positions), 1-based."""
    n = x.shape[0]
    order = jnp.argsort(x)
    r = jnp.empty(n).at[order].set(jnp.arange(1, n + 1, dtype=jnp.float32))
    # tie correction: average rank within equal-value groups
    sorted_x = x[order]
    same_as_prev = jnp.concatenate([jnp.array([False]), sorted_x[1:] == sorted_x[:-1]])
    group_id = jnp.cumsum(~same_as_prev) - 1
    pos = jnp.arange(1, n + 1, dtype=jnp.float32)
    group_sum = jax.ops.segment_sum(pos, group_id, num_segments=n)
    group_cnt = jax.ops.segment_sum(jnp.ones(n), group_id, num_segments=n)
    mean_rank = group_sum / jnp.maximum(group_cnt, 1)
    r_sorted = mean_rank[group_id]
    return jnp.empty(n).at[order].set(r_sorted)


def spearman(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Spearman ρ = Pearson correlation of the rank transforms."""
    rp, rt = _ranks(pred.ravel()), _ranks(target.ravel())
    rp = rp - rp.mean()
    rt = rt - rt.mean()
    denom = jnp.sqrt((rp**2).sum() * (rt**2).sum())
    return jnp.where(denom == 0, 0.0, (rp * rt).sum() / denom)
