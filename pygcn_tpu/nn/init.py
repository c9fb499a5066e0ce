"""Parameter initializers replicating the reference's PyTorch semantics.

The reference relies on two torch init schemes whose exact distributions we
reproduce so per-layer activations can match:

- ``GraphConvolution.reset_parameters`` (reference ``pygcn/layers.py:23-29``):
  ``kaiming_uniform_`` on a weight stored **(in_features, out_features)**.
  Torch computes fan_in as ``tensor.size(1)`` assuming an (out, in) layout, so
  for this transposed storage the effective fan is ``out_features`` — bound
  ``sqrt(6 / out_features)`` (gain √2, a=0). Bias: uniform ±1/√out_features.
- ``torch.nn.Linear`` default: ``kaiming_uniform_(a=√5)`` on an (out, in)
  weight — bound ``1/√in_features``; bias uniform ±1/√in_features.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def graphconv_weight(key, in_features: int, out_features: int, dtype=jnp.float32):
    """Torch ``kaiming_uniform_`` on an (in, out)-stored weight: the torch fan
    heuristic reads size(1)=out_features, giving bound ``sqrt(6/out_features)``."""
    bound = math.sqrt(6.0 / out_features)
    return uniform(key, (in_features, out_features), bound, dtype)


def graphconv_bias(key, out_features: int, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(out_features)
    return uniform(key, (out_features,), bound, dtype)


def linear_weight(key, in_features: int, out_features: int, dtype=jnp.float32):
    """Torch Linear default init; stored (in, out) for ``x @ W`` (same
    elementwise distribution — the bound depends only on in_features)."""
    bound = 1.0 / math.sqrt(in_features)
    return uniform(key, (in_features, out_features), bound, dtype)


def linear_bias(key, in_features: int, out_features: int, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(in_features)
    return uniform(key, (out_features,), bound, dtype)
