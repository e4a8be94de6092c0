"""Gradient scaling / reversal layer.

The cornerstone of the DA mechanism (reference
maskrcnn_benchmark/layers/gradient_scalar_layer.py:4-30): identity forward,
``grad * weight`` backward. Negative weights give adversarial gradient
reversal; +1*w is used for the consistency branch (reference
da_heads.py:98-101). The weight itself never receives a gradient, but it may
be a *traced* scalar — AdvGRL computes it on-device from the probe loss
(reference da_heads.py:173-195 moves it to host via ``.numpy()``; we keep it
on-device, SURVEY §7.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def gradient_scalar(x: jnp.ndarray, weight) -> jnp.ndarray:
    return x


def _fwd(x, weight):
    return x, jnp.asarray(weight)


def _bwd(weight, g):
    return (g * weight.astype(g.dtype), None)


gradient_scalar.defvjp(_fwd, _bwd)


def grad_reverse(x: jnp.ndarray, weight) -> jnp.ndarray:
    """Convenience: gradient reversal with positive-magnitude ``weight``."""
    return gradient_scalar(x, -jnp.asarray(weight))
