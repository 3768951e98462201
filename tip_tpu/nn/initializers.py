"""Parameter initializers matching the reference's distributions.

The reference initializes every parameter with explicit normal/uniform draws
(reference: src/layers.py:61-74, 220-224, 467-468, 552-553, 594-595,
633-637); PyG's GCNConv uses glorot-uniform weights and zero bias.  Keeping
the same distributions makes small-config training trajectories statistically
comparable and lets parity tests inject identical parameters.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def normal(key, shape, std=1.0, dtype=jnp.float32):
    return std * jax.random.normal(key, shape, dtype)


def glorot_uniform(key, shape, dtype=jnp.float32):
    """PyG glorot: U(-a, a) with a = sqrt(6 / (fan_in + fan_out))."""
    fan_in, fan_out = shape[-2], shape[-1]
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


def rgcn_std(in_channels: int, after_relu: bool) -> float:
    """std for basis/root weights (reference: src/layers.py:65-71)."""
    return 2.0 / in_channels if after_relu else 1.0 / math.sqrt(in_channels)


def hierarchy_std(in_dim: int, after_relu: bool) -> float:
    """std for the bipartite conv weight (reference: src/layers.py:220-224)."""
    return 1.0 / math.sqrt(in_dim) if after_relu else 2.0 / math.sqrt(in_dim)
