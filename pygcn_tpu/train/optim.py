"""Optimizers and LR scheduling.

``adam_l2`` reproduces ``torch.optim.Adam(lr, weight_decay)`` exactly: L2 decay
is added *into the gradient* before the Adam moments (not decoupled AdamW) —
the scheme every reference trainer uses (e.g. ``pygcn/gnn-over-mlp.py:385``).
The learning rate is injected as a runtime hyperparameter so the host-side
plateau scheduler can anneal it without recompiling the train step.

``ReduceLROnPlateau`` mirrors ``torch.optim.lr_scheduler.ReduceLROnPlateau``
semantics for the configurations the reference uses (mode max/min, factor,
patience — ``pygcn/gnn-over-mlp.py:386-387``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import optax


def adam_l2(
    learning_rate: float,
    weight_decay: float = 0.0,
    *,
    grad_clip_norm: Optional[float] = None,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """torch-Adam-compatible optimizer with optional global-norm grad clipping.

    Order matches torch: clip (``clip_grad_norm_`` is applied by callers before
    ``optimizer.step()``, reference ``pygcn/gnn-over-mlp.py:311``), add L2 term,
    then Adam.
    """
    parts = []
    if grad_clip_norm is not None:
        parts.append(optax.clip_by_global_norm(grad_clip_norm))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(
        optax.inject_hyperparams(
            lambda learning_rate: optax.adam(learning_rate, b1=b1, b2=b2, eps=eps)
        )(learning_rate=learning_rate)
    )
    return optax.chain(*parts)


def set_learning_rate(opt_state, lr: float):
    """Rewrite the injected learning rate inside an ``adam_l2`` state."""
    import jax.numpy as jnp

    # the inject_hyperparams state is the last element of the chain state
    opt_state[-1].hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(opt_state[-1].hyperparams["learning_rate"])


@dataclasses.dataclass
class ReduceLROnPlateau:
    """Host-side plateau scheduler driving ``set_learning_rate``."""

    mode: str = "min"
    factor: float = 0.5
    patience: int = 10
    threshold: float = 1e-4
    min_lr: float = 0.0
    cooldown: int = 0

    best: Optional[float] = None
    num_bad: int = 0
    cooldown_counter: int = 0

    def _is_better(self, metric: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            return metric < self.best * (1 - self.threshold)
        return metric > self.best * (1 + self.threshold)

    def step(self, metric: float, opt_state):
        """Update with the epoch metric; returns (opt_state, reduced: bool)."""
        metric = float(metric)
        if self._is_better(metric):
            self.best = metric
            self.num_bad = 0
        elif self.cooldown_counter > 0:
            self.cooldown_counter -= 1
        else:
            self.num_bad += 1

        if self.num_bad > self.patience:
            old = get_learning_rate(opt_state)
            new = max(old * self.factor, self.min_lr)
            if new < old:
                opt_state = set_learning_rate(opt_state, new)
            self.num_bad = 0
            self.cooldown_counter = self.cooldown
            return opt_state, True
        return opt_state, False

    def state_dict(self):
        return {
            "best": self.best,
            "num_bad": self.num_bad,
            "cooldown_counter": self.cooldown_counter,
        }

    def load_state_dict(self, d):
        self.best = d["best"]
        self.num_bad = d["num_bad"]
        self.cooldown_counter = d["cooldown_counter"]
