"""Fixed-shape greedy NMS for TPU.

Replaces the reference CUDA kernel (csrc/cuda/nms.cu:23-130 — 64-bit mask
blocking over sorted boxes) with an XLA-friendly formulation:

Greedy NMS over score-sorted boxes is the unique solution of

    keep[i] = valid[i] and not OR_{j<i} (keep[j] and iou(j, i) > t)

(the suppression relation S is strictly upper-triangular in score order, so
the solution is unique by induction). We compute it chunk-by-chunk: resolve
each 256-box chunk by fixpoint iteration on its [C, C] suppression matrix
(converges in <= suppression-chain-depth iterations, typically a handful),
then suppress all later boxes with one [C, N] IoU mask — vector/matrix ops
only, no data-dependent shapes, no host sync. Semantics match the reference
kernel exactly (IoU > threshold suppression, legacy +1 pixel widths,
descending score order).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .box_ops import box_iou

NEG_INF = -1e30


def _resolve_chunk(candidates: jnp.ndarray, suppress: jnp.ndarray) -> jnp.ndarray:
    """Exact greedy keep-set of one chunk.

    candidates: [C] bool; suppress: [C, C] bool, strictly upper-triangular
    (suppress[j, i] == True when kept j would suppress i, j < i in score
    order). Fixpoint iteration; any fixpoint equals the greedy answer.
    """
    c = candidates.shape[0]

    def cond(state):
        _, changed, it = state
        return changed & (it < c)

    def body(state):
        keep, _, it = state
        new = candidates & ~jnp.any(keep[:, None] & suppress, axis=0)
        return new, jnp.any(new != keep), it + 1

    keep, _, _ = lax.while_loop(cond, body, (candidates, jnp.bool_(True), 0))
    return keep


@partial(jax.jit, static_argnames=("legacy_plus1", "chunk", "presorted"))
def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
             iou_threshold: float, *, legacy_plus1: bool = True,
             chunk: int = 256, presorted: bool = False) -> jnp.ndarray:
    """Greedy NMS. Returns keep mask [N] in the *original* box order.

    boxes [N, 4] xyxy, scores [N], valid [N] bool. Ties broken by original
    index (stable sort), like the reference's sorted-order kernel.

    ``presorted`` skips the internal sort when scores are already descending
    among valid entries (e.g. straight out of lax.top_k) — invalid rows may
    sit anywhere, they neither keep nor suppress.
    """
    n = boxes.shape[0]
    c = min(chunk, max(8, n))
    n_pad = -(-n // c) * c

    if presorted:
        order = jnp.arange(n)
    else:
        masked_scores = jnp.where(valid, scores, NEG_INF)
        order = jnp.argsort(-masked_scores)  # stable descending
    bs = jnp.zeros((n_pad, 4), boxes.dtype).at[:n].set(boxes[order])
    vs = jnp.zeros((n_pad,), bool).at[:n].set(valid[order])

    tri = jnp.triu(jnp.ones((c, c), bool), k=1)
    col = jnp.arange(n_pad)

    def outer(ci, suppressed):
        c0 = ci * c
        b_c = lax.dynamic_slice(bs, (c0, 0), (c, 4))
        sup_c = lax.dynamic_slice(suppressed, (c0,), (c,))
        v_c = lax.dynamic_slice(vs, (c0,), (c,)) & ~sup_c
        iou_cc = box_iou(b_c, b_c, legacy_plus1)
        keep_c = _resolve_chunk(v_c, tri & (iou_cc > iou_threshold))
        # kept boxes of this chunk suppress everything later
        iou_cn = box_iou(b_c, bs, legacy_plus1)
        hit = jnp.any(keep_c[:, None] & (iou_cn > iou_threshold), axis=0)
        suppressed = suppressed | (hit & (col >= c0 + c))
        return lax.dynamic_update_slice(suppressed, sup_c | (v_c & ~keep_c), (c0,))

    suppressed = lax.fori_loop(0, n_pad // c, outer, jnp.zeros((n_pad,), bool))
    keep_sorted = vs & ~suppressed
    return jnp.zeros((n,), bool).at[order].set(keep_sorted[:n])


@partial(jax.jit, static_argnames=("k", "legacy_plus1", "chunk", "presorted"))
def nms_topk(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
             iou_threshold: float, k: int, *, legacy_plus1: bool = True,
             chunk: int = 256, presorted: bool = False):
    """NMS then top-k survivors by score.

    Returns (indices [k] into the original arrays, valid_k [k] bool). This is
    the fixed-capacity analog of the reference's ``keep[:post_nms_top_n]``
    (rpn/inference.py:110-123).
    """
    keep = nms_mask(boxes, scores, valid, iou_threshold,
                    legacy_plus1=legacy_plus1, chunk=chunk, presorted=presorted)
    kept_scores = jnp.where(keep, scores, NEG_INF)
    k_eff = min(k, kept_scores.shape[0])
    top_scores, idx = lax.top_k(kept_scores, k_eff)
    if k_eff < k:
        idx = jnp.concatenate([idx, jnp.zeros(k - k_eff, idx.dtype)])
        top_scores = jnp.concatenate(
            [top_scores, jnp.full(k - k_eff, NEG_INF, top_scores.dtype)])
    return idx, top_scores > NEG_INF / 2
