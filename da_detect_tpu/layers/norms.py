"""Normalization layers.

FrozenBatchNorm: BN with inference statistics folded into a per-channel
affine (reference layers/batch_norm.py:6-24). The scale/bias live in the
"frozen" variable collection — structurally untrainable, matching the
reference's buffer registration (no requires_grad, no weight decay).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class FrozenBatchNorm(nn.Module):
    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        scale = self.variable("frozen", "scale", jnp.ones, (features,))
        bias = self.variable("frozen", "bias", jnp.zeros, (features,))
        s = jax.lax.stop_gradient(scale.value).astype(x.dtype)
        b = jax.lax.stop_gradient(bias.value).astype(x.dtype)
        return x * s + b


def make_norm(kind: str, name: str, num_groups: int = 32, epsilon: float = 1e-5):
    """Factory used by backbone/heads ("frozen_bn" | "gn" | "none")."""
    if kind == "frozen_bn":
        return FrozenBatchNorm(name=name)
    if kind == "gn":
        return nn.GroupNorm(num_groups=num_groups, epsilon=epsilon, name=name)
    if kind == "none":
        return lambda x: x
    raise ValueError(f"unknown norm kind: {kind}")
