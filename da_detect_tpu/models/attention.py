"""Position & channel attention modules (reference
modeling/detector/attention.py:28-91 — SAGAN-style PAM/CAM; imported but
never instantiated by the reference forward. Provided as optional building
blocks for parity; quadratic spatial self-attention, so use on small maps.)
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class PAM(nn.Module):
    """Position attention: softmax over pairwise pixel affinities."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        q = nn.Conv(c // 8, (1, 1), dtype=self.dtype, name="query")(x)
        k = nn.Conv(c // 8, (1, 1), dtype=self.dtype, name="key")(x)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="value")(x)
        q = q.reshape(b, h * w, -1)
        k = k.reshape(b, h * w, -1)
        v = v.reshape(b, h * w, c)
        att = nn.softmax(jnp.einsum("bnc,bmc->bnm", q, k,
                                    preferred_element_type=jnp.float32),
                         axis=-1).astype(x.dtype)
        out = jnp.einsum("bnm,bmc->bnc", att, v).reshape(b, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return gamma * out + x


class CAM(nn.Module):
    """Channel attention: softmax over channel-channel affinities."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        flat = x.reshape(b, h * w, c)
        energy = jnp.einsum("bnc,bnd->bcd", flat, flat,
                            preferred_element_type=jnp.float32)
        # reference uses max-normalized energy before softmax
        energy = jnp.max(energy, axis=-1, keepdims=True) - energy
        att = nn.softmax(energy, axis=-1).astype(x.dtype)
        out = jnp.einsum("bcd,bnd->bnc", att, flat).reshape(b, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return gamma * out + x
