"""Proposal-to-GT matching, pure jnp.

Functional re-design of the reference ``Matcher`` (modeling/matcher.py:5-108):
same sentinel convention (-1 = BELOW_LOW_THRESHOLD, -2 = BETWEEN_THRESHOLDS)
and the same allow_low_quality quirk — a prediction that is some GT's best
match is restored to its *original argmax* match, which may be a different GT
(reference matcher.py:82-108 via set_low_quality_matches_).

Orientation: ``iou`` is [N_pred, G_gt] (transposed from the reference's
[G, N]); padded GT rows are excluded via ``gt_valid``.
"""

from __future__ import annotations

import jax.numpy as jnp

BELOW_LOW_THRESHOLD = -1
BETWEEN_THRESHOLDS = -2


def match_proposals(iou: jnp.ndarray, gt_valid: jnp.ndarray,
                    high_threshold: float, low_threshold: float,
                    allow_low_quality_matches: bool = False) -> jnp.ndarray:
    """Returns matches [..., N]: GT index, or -1 (below low), -2 (between).

    With no valid GT, everything is -1 (the reference raises on empty GT and
    callers special-case it; a padded all-invalid row behaves as background).
    """
    neg = jnp.asarray(-1.0, iou.dtype)
    masked = jnp.where(gt_valid[..., None, :], iou, neg)
    matched_vals = jnp.max(masked, axis=-1)
    all_matches = jnp.argmax(masked, axis=-1).astype(jnp.int32)

    matches = jnp.where(matched_vals < low_threshold, BELOW_LOW_THRESHOLD, all_matches)
    matches = jnp.where((matched_vals >= low_threshold) & (matched_vals < high_threshold),
                        BETWEEN_THRESHOLDS, matches)

    if allow_low_quality_matches:
        # best value per GT over predictions; ties all count (reference
        # matcher.py:99-105 uses == comparison on the max). DELIBERATE
        # DEVIATION: the reference restores even when a GT's best IoU is 0,
        # which marks EVERY zero-IoU prediction as that GT's match (an
        # upstream pathology); the `best_per_gt > 0` guard keeps such
        # predictions background instead — this only differs for a valid GT
        # overlapping nothing at all.
        best_per_gt = jnp.max(masked, axis=-2, keepdims=True)      # [..., 1, G]
        is_best = (masked == best_per_gt) & gt_valid[..., None, :] & (best_per_gt > 0)
        restore = jnp.any(is_best, axis=-1)                        # [..., N]
        matches = jnp.where(restore, all_matches, matches)

    any_gt = jnp.any(gt_valid, axis=-1)[..., None]
    return jnp.where(any_gt, matches, BELOW_LOW_THRESHOLD)
