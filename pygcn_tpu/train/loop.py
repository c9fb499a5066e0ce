"""Training-loop utilities: early stopping and jitted step builders.

``EarlyStopping`` mirrors the reference's ``pytorchtools.EarlyStopping``
(``pygcn/pytorchtools.py:4-51``): a patience counter on (minus) validation
loss with a minimum-delta threshold.

``make_classifier_steps`` builds the jitted full-batch train/eval steps for
semi-supervised node classification (the KipfGCN/Cora workload): one fused
forward+backward+Adam update per call, everything resident on device.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass
class EarlyStopping:
    patience: int = 7
    delta: float = 0.0
    verbose: bool = False

    counter: int = 0
    best_score: Optional[float] = None
    early_stop: bool = False

    def __call__(self, val_loss: float) -> bool:
        score = -float(val_loss)
        if self.best_score is None:
            self.best_score = score
        elif score < self.best_score + self.delta:
            self.counter += 1
            if self.verbose:
                print(f"EarlyStopping counter: {self.counter} out of {self.patience}")
            if self.counter >= self.patience:
                self.early_stop = True
        else:
            self.best_score = score
            self.counter = 0
        return self.early_stop

    def state_dict(self) -> dict:
        return {
            "counter": self.counter,
            "best_score": self.best_score,
            "early_stop": self.early_stop,
        }

    def load_state_dict(self, state: dict) -> None:
        self.counter = int(state["counter"])
        self.best_score = state["best_score"]
        self.early_stop = bool(state["early_stop"])


def nll_loss(log_probs: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean negative log-likelihood over the given nodes (labels int [M])."""
    return -jnp.take_along_axis(log_probs, labels[:, None], axis=1).mean()


def make_classifier_steps(model, optimizer, graph):
    """Returns jitted ``train_step(params, opt_state, x, y, idx, rng)`` and
    ``eval_step(params, x, y, idx)`` for a log-softmax node classifier.

    ``idx`` masks are passed as boolean [N] arrays so shapes stay static under
    jit regardless of split sizes.
    """

    def loss_fn(params, x, labels, mask, rng):
        logp = model(params, x, graph, dropout_rng=rng)
        per_node = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
        return (per_node * mask).sum() / mask.sum()

    @jax.jit
    def train_step(params, opt_state, x, labels, mask, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, labels, mask, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def eval_step(params, x, labels, mask):
        logp = model(params, x, graph)
        per_node = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
        loss = (per_node * mask).sum() / mask.sum()
        correct = (jnp.argmax(logp, axis=1) == labels) * mask
        return loss, correct.sum() / mask.sum()

    return train_step, eval_step


def bool_mask(idx, n: int) -> jnp.ndarray:
    m = np.zeros(n, np.float32)
    m[np.asarray(idx)] = 1.0
    return jnp.asarray(m)
