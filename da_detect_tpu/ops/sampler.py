"""Balanced positive/negative sampling, stateless and fixed-shape.

Functional re-design of the reference
``BalancedPositiveNegativeSampler`` (modeling/
balanced_positive_negative_sampler.py:13-68): cap positives at
``batch_size * positive_fraction``, fill the rest with negatives, choose
uniformly at random. Instead of dynamic index tensors we return fixed-shape
selection masks (and, for ROI gathering, a fixed-length index list) driven by
an explicit PRNG key — jit-safe and reproducible (SURVEY §7.1 "stateless
sampling").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _rank_among(mask: jnp.ndarray, priority: jnp.ndarray) -> jnp.ndarray:
    """Rank (0-based) of each element among ``mask`` elements by descending
    ``priority``; invalid elements get large ranks."""
    n = mask.shape[-1]
    key = jnp.where(mask, priority, -jnp.inf)
    order = jnp.argsort(-key, axis=-1)
    put = jnp.broadcast_to(jnp.arange(n), order.shape)
    if order.ndim > 1:
        ranks = jax.vmap(lambda o, p: jnp.zeros_like(o).at[o].set(p))(
            order.reshape(-1, n), put.reshape(-1, n)).reshape(order.shape)
    else:
        ranks = jnp.zeros_like(order).at[order].set(put)
    return jnp.where(mask, ranks, n)


def balanced_sample(key: jax.Array, labels: jnp.ndarray, batch_size: int,
                    positive_fraction: float):
    """labels [..., N]: -1 ignore, 0 negative, >=1 positive.

    Returns (pos_selected, neg_selected) bool masks of shape [..., N] with
    |pos| = min(#pos, batch_size*fraction) and |neg| = min(#neg,
    batch_size - |pos|), uniformly sampled.
    """
    is_pos = labels >= 1
    is_neg = labels == 0
    kp, kn = jax.random.split(key)
    num_pos_cap = int(batch_size * positive_fraction)
    num_pos = jnp.minimum(jnp.sum(is_pos, axis=-1), num_pos_cap)
    num_neg = jnp.minimum(jnp.sum(is_neg, axis=-1), batch_size - num_pos)

    rp = _rank_among(is_pos, jax.random.uniform(kp, labels.shape))
    rn = _rank_among(is_neg, jax.random.uniform(kn, labels.shape))
    pos_selected = is_pos & (rp < num_pos[..., None])
    neg_selected = is_neg & (rn < num_neg[..., None])
    return pos_selected, neg_selected


def selection_to_indices(pos_selected: jnp.ndarray, neg_selected: jnp.ndarray,
                         batch_size: int):
    """Convert selection masks [N] (single image) into a fixed-length index
    list [batch_size] — positives first, then negatives, then padding
    (repeats of index 0 with valid=False).

    Returns (indices, is_pos, valid), each [batch_size].
    """
    n = pos_selected.shape[-1]
    # priority: positives (2) > negatives (1) > rest (0); stable in index order
    prio = jnp.where(pos_selected, 2, jnp.where(neg_selected, 1, 0))
    order = jnp.argsort(-prio, axis=-1, stable=True)[..., :batch_size]
    sel = jnp.take_along_axis(prio, order, axis=-1)
    if order.shape[-1] < batch_size:
        # fewer proposals than the sampling budget: pad to the fixed size
        pad = batch_size - order.shape[-1]
        order = jnp.concatenate(
            [order, jnp.zeros(order.shape[:-1] + (pad,), order.dtype)], axis=-1)
        sel = jnp.concatenate(
            [sel, jnp.zeros(sel.shape[:-1] + (pad,), sel.dtype)], axis=-1)
    valid = sel >= 1
    is_pos = sel == 2
    indices = jnp.where(valid, order, 0)
    return indices, is_pos, valid
