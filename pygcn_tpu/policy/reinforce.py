"""REINFORCE policy training for the SoftGenerator.

TPU-native rebuild of the reference's ``rl-policy-generator.py`` core:

- sampling NN nodes *without replacement* from the attention distribution
  (reference ``torch.multinomial(..., replacement=False)`` at :332) becomes a
  jit/vmap-able **Gumbel-top-k** draw — the two samplers define the same
  distribution;
- log-probs are the sum of per-action categorical log-probs under the current
  policy (the reference's bookkeeping at :333-336) and are *recomputed inside
  the loss* instead of being stored as autograd graphs (JAX has no implicit
  tape);
- ``finish_episode`` semantics (:373-417): rewards normalized
  ``(r−μ)/(σ+eps)``, loss ``Σ −logπ·R``, single optimizer step;
- the replay buffer mirrors reference ``utils.ReplayBuffer``
  (``pygcn/utils.py:481-522``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

EPS = np.finfo(np.float32).eps.item()


def gumbel_topk_sample(key, probs: jax.Array, k: int) -> jax.Array:
    """k distinct indices ~ successive renormalized categorical draws."""
    g = jax.random.gumbel(key, probs.shape)
    z = jnp.log(jnp.clip(probs, 1e-30)) + g
    return jax.lax.top_k(z, k)[1]


def policy_log_prob(probs: jax.Array, actions: jax.Array) -> jax.Array:
    """Σ log p(a) over the action set (reference :333-336 — fixed-distribution
    log-probs, not the without-replacement chain rule)."""
    return jnp.log(jnp.clip(probs, 1e-30))[actions].sum()


def normalize_rewards(rewards: jax.Array) -> jax.Array:
    return (rewards - rewards.mean()) / (rewards.std() + EPS)


def make_reinforce_episode(model, optimizer: optax.GradientTransformation, graph):
    """Builds the jitted pieces of one REINFORCE episode.

    Returns ``(sample_actions, update)``:

    - ``sample_actions(params, feats, key, width, nn)`` → ``actions`` [W, NN]
      distinct-node policies drawn from the current attention distribution;
    - ``update(params, opt_state, feats, actions, rewards)`` → new params,
      opt_state, loss, avg_reward — recomputes log-probs under the current
      policy and applies the normalized-reward REINFORCE loss.
    """

    from functools import partial

    @partial(jax.jit, static_argnames=("width", "nn"))
    def sample_actions(params, feats, key, width: int, nn: int):
        probs = model.apply(params, feats, graph)
        keys = jax.random.split(key, width)
        return jax.vmap(lambda k: gumbel_topk_sample(k, probs, nn))(keys)

    def loss_fn(params, feats, actions, rewards_norm):
        probs = model.apply(params, feats, graph)
        logp = jax.vmap(lambda a: policy_log_prob(probs, a))(actions)
        return -(logp * rewards_norm).sum()

    @jax.jit
    def update(params, opt_state, feats, actions, rewards):
        rewards_norm = normalize_rewards(rewards)
        loss, grads = jax.value_and_grad(loss_fn)(params, feats, actions, rewards_norm)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, rewards.mean()

    return sample_actions, update


class ReplayBuffer:
    """Reference-semantics replay store (``pygcn/utils.py:481-522``):
    ``{count: [action index list, reward]}`` with min-reward tracking,
    uniform sampling, and current-policy log-prob recomputation."""

    def __init__(self, capacity: int):
        self.replay_buffer = {}
        self.count = 0
        self.capacity = capacity
        self.min_reward = np.inf
        self.min_reward_idx = 0

    def store_transition(self, action_idxs, reward: float) -> None:
        self.replay_buffer[self.count] = [list(map(int, action_idxs)), float(reward)]
        if reward < self.min_reward:
            self.min_reward = reward
            self.min_reward_idx = self.count
        self.count += 1

    def clear(self) -> None:
        self.replay_buffer = {}
        self.count = 0

    def get_action_and_reward(self, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        idx = int(rng.integers(0, self.count))
        actions, reward = self.replay_buffer[idx]
        return actions, reward

    def get_log_prob(self, model, params, actions, feats, graph):
        """Σ log π(a) of a stored action set under the *current* policy."""
        probs = model.apply(params, feats, graph)
        return policy_log_prob(probs, jnp.asarray(actions))


def greedy_policy(probs, nn: int) -> np.ndarray:
    """Final greedy top-K extraction from the attention scores
    (reference ``rl-policy-generator.py:629-659``)."""
    return np.asarray(jax.lax.top_k(jnp.asarray(probs), nn)[1])
