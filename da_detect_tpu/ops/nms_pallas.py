"""Greedy NMS as ONE Pallas TPU kernel.

The pure-XLA formulation (ops/nms.py) runs a fori_loop of ~N/256 chunk steps,
each a handful of separate XLA ops — correct, but each step pays op-dispatch
overhead and HBM round-trips for the suppression state. This kernel keeps the
score-sorted boxes and all state resident in VMEM and does the whole
suppression sweep in one launch:

  for each 512-box chunk (sequential, score order):
      resolve the chunk internally by fixpoint iteration on its [C, C]
      suppression matrix (MXU matmuls; the greedy solution is the unique
      fixpoint of keep = valid & ~(keep @ S))
      suppress all later boxes with [C, C]-tile IoU sweeps (VPU)

Mosaic layout notes: boxes ride as [4, N] and 1D state as [1, N] so that
per-coordinate loads are lane vectors and vmapped block specs equal the
trailing array dims; slice starts carry pl.multiple_of hints for the
alignment prover; CHUNK is sized so the [C, C] suppression temporaries fit
VMEM even when vmap batches several images into one kernel launch.

Semantics are identical to ops.nms.nms_mask (greedy, IoU > thresh, legacy +1
widths); the caller pre-sorts by score.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 512  # [C,C] temporaries must fit VMEM alongside the batched inputs


def _pair_iou(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2, off):
    """[C] coord vectors vs [T] -> [C, T] IoU."""
    area_a = (ax2 - ax1 + off) * (ay2 - ay1 + off)
    area_b = (bx2 - bx1 + off) * (by2 - by1 + off)
    iw = jnp.maximum(jnp.minimum(ax2[:, None], bx2[None, :])
                     - jnp.maximum(ax1[:, None], bx1[None, :]) + off, 0.0)
    ih = jnp.maximum(jnp.minimum(ay2[:, None], by2[None, :])
                     - jnp.maximum(ay1[:, None], by1[None, :]) + off, 0.0)
    inter = iw * ih
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter,
                               1e-10)


def _nms_kernel(boxes_ref, valid_ref, thresh_ref, keep_ref, sup_ref):
    # 1D state rides as [1, N]: under vmap the batched block spec must equal
    # the array's trailing dims for Mosaic to lower it
    n = boxes_ref.shape[1]
    n_chunks = n // CHUNK
    thresh = thresh_ref[0, 0]
    off = 1.0

    sup_ref[:] = jnp.zeros((1, n), jnp.float32)
    keep_ref[:] = jnp.zeros((1, n), jnp.float32)

    row = lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    col = lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    tri = (row < col).astype(jnp.float32)

    def coords(start):
        s = pl.multiple_of(start, CHUNK)
        return (boxes_ref[0, pl.ds(s, CHUNK)], boxes_ref[1, pl.ds(s, CHUNK)],
                boxes_ref[2, pl.ds(s, CHUNK)], boxes_ref[3, pl.ds(s, CHUNK)])

    def chunk_body(ci, _):
        c0 = pl.multiple_of(ci * CHUNK, CHUNK)
        ax1, ay1, ax2, ay2 = coords(c0)
        v = valid_ref[0, pl.ds(c0, CHUNK)] * (1.0 - sup_ref[0, pl.ds(c0, CHUNK)])

        iou_cc = _pair_iou(ax1, ay1, ax2, ay2, ax1, ay1, ax2, ay2, off)
        s = tri * (iou_cc > thresh).astype(jnp.float32)

        def cond(state):
            _, changed, it = state
            return jnp.logical_and(changed, it < CHUNK)

        def body(state):
            keep, _, it = state
            hit = jnp.dot(keep[None, :], s,
                          preferred_element_type=jnp.float32)[0]
            new = v * (hit <= 0.0).astype(jnp.float32)
            return new, jnp.any(new != keep), it + 1

        keep_c, _, _ = lax.while_loop(cond, body,
                                      (v, jnp.bool_(True), jnp.int32(0)))
        keep_ref[0, pl.ds(c0, CHUNK)] = keep_c

        def tile_body(ti, _):
            # only tiles strictly after this chunk need suppression updates
            t0 = pl.multiple_of((ci + 1 + ti) * CHUNK, CHUNK)
            bx1, by1, bx2, by2 = coords(t0)
            iou_ct = _pair_iou(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2, off)
            hit = jnp.max(
                keep_c[:, None] * (iou_ct > thresh).astype(jnp.float32),
                axis=0)
            sup_ref[0, pl.ds(t0, CHUNK)] = jnp.maximum(
                sup_ref[0, pl.ds(t0, CHUNK)], hit)
            return 0

        lax.fori_loop(0, n_chunks - ci - 1, tile_body, 0)
        return 0

    lax.fori_loop(0, n_chunks, chunk_body, 0)


# toggled by tests to run the kernel in interpreter mode on CPU
INTERPRET = False


@jax.jit
def nms_mask_pallas_sorted(boxes_sorted: jnp.ndarray, valid_sorted: jnp.ndarray,
                           iou_threshold) -> jnp.ndarray:
    """Keep mask over score-DESC-sorted boxes [N, 4] -> [N] bool."""
    n = boxes_sorted.shape[0]
    n_pad = -(-n // CHUNK) * CHUNK
    bt = jnp.zeros((4, n_pad), jnp.float32).at[:, :n].set(
        boxes_sorted.astype(jnp.float32).T)
    v = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(
        valid_sorted.astype(jnp.float32))
    thresh = jnp.asarray([[iou_threshold]], jnp.float32)
    keep = pl.pallas_call(
        _nms_kernel,
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, n_pad), jnp.float32)],
        interpret=INTERPRET,
    )(bt, v, thresh)
    return keep[0, :n] > 0.5


def nms_topk_pallas(boxes, scores, valid, iou_threshold, k, *,
                    presorted: bool = False):
    """Drop-in for ops.nms.nms_topk using the Pallas kernel.

    ``presorted`` skips the argsort when scores are already descending among
    valid entries (straight out of lax.top_k); invalid rows may sit anywhere
    — the kernel's valid mask stops them from keeping or suppressing."""
    masked = jnp.where(valid, scores, -1e30)
    if presorted:
        order = None
        boxes_s, valid_s, scores_s = boxes, valid, masked
    else:
        order = jnp.argsort(-masked)
        boxes_s, valid_s, scores_s = boxes[order], valid[order], masked[order]
    keep_sorted = nms_mask_pallas_sorted(boxes_s, valid_s, iou_threshold)
    kept_scores = jnp.where(keep_sorted, scores_s, -1e30)
    k_eff = min(k, kept_scores.shape[0])
    top_scores, idx_sorted = lax.top_k(kept_scores, k_eff)
    idx = idx_sorted if order is None else order[idx_sorted]
    if k_eff < k:
        idx = jnp.concatenate([idx, jnp.zeros(k - k_eff, idx.dtype)])
        top_scores = jnp.concatenate(
            [top_scores, jnp.full(k - k_eff, -1e30, top_scores.dtype)])
    return idx, top_scores > -1e29
