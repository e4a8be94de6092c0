"""Elementwise losses, pure jnp.

TPU note: these replace two classes of reference code — the trivial python
layers (smooth_l1, reference layers/smooth_l1_loss.py:6-15) and a CUDA kernel
pair (sigmoid focal loss fwd/bwd, reference
csrc/cuda/SigmoidFocalLoss_cuda.cu); on TPU the fused-elementwise forms below
compile to VPU code and autodiff supplies the backward, so no custom kernels
are needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1_loss(input: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0 / 9,
                   weights: jnp.ndarray | None = None, reduction: str = "sum") -> jnp.ndarray:
    """Huber loss with threshold ``beta`` (reference layers/smooth_l1_loss.py)."""
    n = jnp.abs(input - target)
    loss = jnp.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)
    if weights is not None:
        loss = loss * weights
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction == "mean":
        return jnp.mean(loss)
    return loss


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray,
                    weights: jnp.ndarray | None = None, reduction: str = "mean") -> jnp.ndarray:
    """Numerically-stable binary cross entropy on logits
    (torch.nn.functional.binary_cross_entropy_with_logits semantics)."""
    loss = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if weights is not None:
        loss = loss * weights
        if reduction == "mean":
            return jnp.sum(loss) / jnp.maximum(jnp.sum(weights), 1e-10)
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction == "mean":
        return jnp.mean(loss)
    return loss


def sigmoid_focal_loss(logits: jnp.ndarray, targets: jnp.ndarray, gamma: float = 2.0,
                       alpha: float = 0.25) -> jnp.ndarray:
    """RetinaNet focal loss, per-element sum over classes.

    ``logits`` [..., N, C] are class logits for classes 1..C (no background
    column); ``targets`` [..., N] int with 0 = background, c in 1..C = class.
    Matches the reference CUDA kernel's class-index convention
    (csrc/cuda/SigmoidFocalLoss_cuda.cu:21-60 iterates classes 1..C) and the
    python reference (layers/sigmoid_focal_loss.py:40-53).
    """
    num_classes = logits.shape[-1]
    cls_ids = jnp.arange(1, num_classes + 1)
    t = targets[..., None]
    p = jax.nn.sigmoid(logits)
    pos = (t == cls_ids).astype(logits.dtype)
    neg = ((t != cls_ids) & (t >= 0)).astype(logits.dtype)
    log_p = jax.nn.log_sigmoid(logits)
    log_1p = jax.nn.log_sigmoid(-logits)
    term_pos = -pos * alpha * ((1.0 - p) ** gamma) * log_p
    term_neg = -neg * (1.0 - alpha) * (p ** gamma) * log_1p
    return jnp.sum(term_pos + term_neg, axis=-1)


def triplet_margin_loss(anchor: jnp.ndarray, positive: jnp.ndarray,
                        negative: jnp.ndarray, margin, p: float = 2.0,
                        axis: int = -1, eps: float = 1e-6) -> jnp.ndarray:
    """torch.nn.TripletMarginLoss semantics: pairwise p-distance along
    ``axis`` (torch reduces the last dim of NCHW inputs; callers pass the
    matching axis for NHWC), hinge at ``margin``, mean over the rest.
    The reference uses this for the domain-level metric regularization
    (da_heads/loss.py:180-228)."""
    def dist(x, y):
        return jnp.sum(jnp.abs(x - y + eps) ** p, axis=axis) ** (1.0 / p)

    d_ap = dist(anchor, positive)
    d_an = dist(anchor, negative)
    return jnp.mean(jnp.maximum(d_ap - d_an + margin, 0.0))


def softmax_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                          weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean CE over (optionally weighted/masked) rows; labels int [...]."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if weights is None:
        return jnp.mean(nll)
    return jnp.sum(nll * weights) / jnp.maximum(jnp.sum(weights), 1e-10)
