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


def _take_random(mask, rand_key_arr, count, cap, approx):
    """Select ``count`` (dynamic, <= cap) elements of ``mask`` uniformly at
    random: the top-``count`` by iid uniform priority, found via a
    top-``cap`` threshold instead of ranking the whole axis (a full
    argsort over the 268k FPN anchors cost ~4 ms/step; profiled).

    With ``approx`` (TPU.APPROX_TOPK) the threshold comes from
    ``approx_max_k``: its candidate set may miss a few true-top keys, so the
    threshold sits lower and extra elements pass it. A cumulative-count cap
    truncates the selection to exactly ``count`` elements in both paths —
    this also covers duplicate float32 uniform keys at the threshold and the
    thr=-inf case (approx candidate under-fill), which otherwise over-select
    even on the exact path.
    """
    n = mask.shape[-1]
    masked = jnp.where(mask, rand_key_arr, -jnp.inf)
    k = min(cap, n)
    if approx and n > 16 * k:
        vals = jax.lax.approx_max_k(masked, k)[0]
    else:
        vals = jax.lax.top_k(masked, k)[0]
    idx = jnp.clip(count - 1, 0, k - 1)
    thr = jnp.take_along_axis(vals, idx[..., None], axis=-1)[..., 0]
    sel = mask & (masked >= thr[..., None]) & (count[..., None] > 0)
    return sel & (jnp.cumsum(sel, axis=-1) <= count[..., None])


def balanced_sample(key: jax.Array, labels: jnp.ndarray, batch_size: int,
                    positive_fraction: float, approx: bool = False):
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

    pos_selected = _take_random(is_pos, jax.random.uniform(kp, labels.shape),
                                num_pos, num_pos_cap, approx)
    neg_selected = _take_random(is_neg, jax.random.uniform(kn, labels.shape),
                                num_neg, batch_size, approx)
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
