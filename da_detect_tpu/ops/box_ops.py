"""Box geometry + Faster-RCNN box coding, pure jnp.

Semantics follow the reference exactly, including the Detectron legacy
``TO_REMOVE = 1`` pixel convention (width = x2 - x1 + 1) used throughout
boxlist_ops / box_coder / csrc NMS (reference structures/boxlist_ops.py:56-104,
modeling/box_coder.py:7-76, csrc/cuda/nms.cu). Pass ``legacy_plus1=False``
for modern continuous-coordinate semantics.

All functions broadcast over leading batch dims and are jit/vmap-safe.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# decode clamp: same constant as the reference box coder
# (modeling/box_coder.py:13: bbox_xform_clip=math.log(1000. / 16))
BBOX_XFORM_CLIP = math.log(1000.0 / 16)


def _wh(boxes: jnp.ndarray, legacy_plus1: bool = True):
    off = 1.0 if legacy_plus1 else 0.0
    w = boxes[..., 2] - boxes[..., 0] + off
    h = boxes[..., 3] - boxes[..., 1] + off
    return w, h


def box_area(boxes: jnp.ndarray, legacy_plus1: bool = True) -> jnp.ndarray:
    w, h = _wh(boxes, legacy_plus1)
    return w * h


def box_iou(a: jnp.ndarray, b: jnp.ndarray, legacy_plus1: bool = True) -> jnp.ndarray:
    """Pairwise IoU. a [..., N, 4], b [..., M, 4] -> [..., N, M].

    Matches reference boxlist_iou (structures/boxlist_ops.py:56-104).
    """
    off = 1.0 if legacy_plus1 else 0.0
    area_a = box_area(a, legacy_plus1)[..., :, None]
    area_b = box_area(b, legacy_plus1)[..., None, :]
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt + off, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.maximum(area_a + area_b - inter, 1e-10)


def encode_boxes(reference_boxes: jnp.ndarray, proposals: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0), legacy_plus1: bool = True) -> jnp.ndarray:
    """Encode gt `reference_boxes` w.r.t. `proposals` as (dx,dy,dw,dh)
    regression targets (reference modeling/box_coder.py:22-45)."""
    wx, wy, ww, wh = weights
    ex_w, ex_h = _wh(proposals, legacy_plus1)
    ex_cx = proposals[..., 0] + 0.5 * ex_w
    ex_cy = proposals[..., 1] + 0.5 * ex_h
    gt_w, gt_h = _wh(reference_boxes, legacy_plus1)
    gt_cx = reference_boxes[..., 0] + 0.5 * gt_w
    gt_cy = reference_boxes[..., 1] + 0.5 * gt_h
    # guard against degenerate padded rows
    ex_w = jnp.maximum(ex_w, 1e-6)
    ex_h = jnp.maximum(ex_h, 1e-6)
    gt_w = jnp.maximum(gt_w, 1e-6)
    gt_h = jnp.maximum(gt_h, 1e-6)
    return jnp.stack([
        wx * (gt_cx - ex_cx) / ex_w,
        wy * (gt_cy - ex_cy) / ex_h,
        ww * jnp.log(gt_w / ex_w),
        wh * jnp.log(gt_h / ex_h),
    ], axis=-1)


def decode_boxes(deltas: jnp.ndarray, boxes: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0), legacy_plus1: bool = True) -> jnp.ndarray:
    """Apply (dx,dy,dw,dh) deltas to anchor/proposal `boxes`
    (reference modeling/box_coder.py:47-76). deltas [..., N, 4*k]."""
    wx, wy, ww, wh = weights
    w, h = _wh(boxes, legacy_plus1)
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h

    dx = deltas[..., 0::4] / wx
    dy = deltas[..., 1::4] / wy
    dw = jnp.minimum(deltas[..., 2::4] / ww, BBOX_XFORM_CLIP)
    dh = jnp.minimum(deltas[..., 3::4] / wh, BBOX_XFORM_CLIP)

    pred_cx = dx * w[..., None] + cx[..., None]
    pred_cy = dy * h[..., None] + cy[..., None]
    pred_w = jnp.exp(dw) * w[..., None]
    pred_h = jnp.exp(dh) * h[..., None]

    off = 1.0 if legacy_plus1 else 0.0
    out = jnp.stack([
        pred_cx - 0.5 * pred_w,
        pred_cy - 0.5 * pred_h,
        pred_cx + 0.5 * pred_w - off,
        pred_cy + 0.5 * pred_h - off,
    ], axis=-1)  # [..., N, k, 4]
    return out.reshape(deltas.shape)


def clip_boxes(boxes: jnp.ndarray, height, width, legacy_plus1: bool = True) -> jnp.ndarray:
    """Clamp to the image frame (reference bounding_box.py clip_to_image)."""
    off = 1.0 if legacy_plus1 else 0.0
    hmax = jnp.asarray(height, boxes.dtype) - off
    wmax = jnp.asarray(width, boxes.dtype) - off
    x1 = jnp.clip(boxes[..., 0], 0.0, wmax)
    y1 = jnp.clip(boxes[..., 1], 0.0, hmax)
    x2 = jnp.clip(boxes[..., 2], 0.0, wmax)
    y2 = jnp.clip(boxes[..., 3], 0.0, hmax)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def min_size_mask(boxes: jnp.ndarray, min_size: float, legacy_plus1: bool = True) -> jnp.ndarray:
    """True where both sides >= min_size (reference remove_small_boxes,
    boxlist_ops.py:37-54)."""
    w, h = _wh(boxes, legacy_plus1)
    return (w >= min_size) & (h >= min_size)


def scale_boxes(boxes: jnp.ndarray, scale_y, scale_x) -> jnp.ndarray:
    """Per-axis rescale (reference BoxList.resize for the non-uniform case)."""
    sx = jnp.asarray(scale_x, boxes.dtype)
    sy = jnp.asarray(scale_y, boxes.dtype)
    return boxes * jnp.stack([sx, sy, sx, sy], axis=-1)


def hflip_boxes(boxes: jnp.ndarray, image_width, legacy_plus1: bool = True) -> jnp.ndarray:
    off = 1.0 if legacy_plus1 else 0.0
    w = jnp.asarray(image_width, boxes.dtype)
    x1 = w - off - boxes[..., 2]
    x2 = w - off - boxes[..., 0]
    return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)


def xywh_to_xyxy(boxes: jnp.ndarray, legacy_plus1: bool = True) -> jnp.ndarray:
    off = 1.0 if legacy_plus1 else 0.0
    x, y, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack([x, y, x + jnp.maximum(w - off, 0.0), y + jnp.maximum(h - off, 0.0)], axis=-1)


def xyxy_to_xywh(boxes: jnp.ndarray, legacy_plus1: bool = True) -> jnp.ndarray:
    off = 1.0 if legacy_plus1 else 0.0
    x1, y1, x2, y2 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack([x1, y1, x2 - x1 + off, y2 - y1 + off], axis=-1)
