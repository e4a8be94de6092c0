"""RetinaNet (reference modeling/rpn/retinanet/*, ~440 LoC upstream feature).

Single-stage head over the P3-P7 pyramid: shared 4-conv class/box towers,
focal loss (the reference's CUDA SigmoidFocalLoss kernel is plain fused
elementwise jnp here), per-level fixed-shape candidate selection, class-offset
NMS. Semantics follow retinanet/{retinanet,loss,inference}.py: matcher
(FG 0.5 / BG 0.4, allow_low_quality), focal normalized by (num_pos + N),
smooth-l1 beta 0.11 normalized by num_pos * BBOX_REG_WEIGHT, prior-prob bias
init on the class logits.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import box_ops
from ..ops.losses import sigmoid_focal_loss, smooth_l1_loss
from ..ops.matcher import match_proposals
from ..ops.nms import nms_topk
from ..structures.image_batch import ImageBatch, Targets
from .anchors import AnchorGenerator, make_anchor_generator_retinanet
from .box_head import Detections

_normal001 = nn.initializers.normal(0.01)

REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


class RetinaNetHead(nn.Module):
    num_classes: int          # foreground classes (C - 1)
    num_anchors: int
    num_convs: int = 4
    prior_prob: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features):
        ch = features[0].shape[-1]
        cls_tower = [nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                             kernel_init=_normal001, dtype=self.dtype,
                             name=f"cls_tower{i}") for i in range(self.num_convs)]
        box_tower = [nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                             kernel_init=_normal001, dtype=self.dtype,
                             name=f"bbox_tower{i}") for i in range(self.num_convs)]
        bias_init = nn.initializers.constant(
            -math.log((1 - self.prior_prob) / self.prior_prob))
        cls_logits = nn.Conv(self.num_anchors * self.num_classes, (3, 3),
                             padding=((1, 1), (1, 1)), kernel_init=_normal001,
                             bias_init=bias_init, dtype=self.dtype,
                             name="cls_logits")
        bbox_pred = nn.Conv(self.num_anchors * 4, (3, 3),
                            padding=((1, 1), (1, 1)), kernel_init=_normal001,
                            dtype=self.dtype, name="bbox_pred")
        logits, regs = [], []
        for f in features:
            t = f.astype(self.dtype)
            b = f.astype(self.dtype)
            for conv in cls_tower:
                t = nn.relu(conv(t))
            for conv in box_tower:
                b = nn.relu(conv(b))
            logits.append(cls_logits(t))
            regs.append(bbox_pred(b))
        return logits, regs


def retinanet_loss(key_unused, anchors_cat, cls_logits, box_regression,
                   gt_boxes, gt_labels, gt_valid, is_source, image_sizes, *,
                   fg_iou=0.5, bg_iou=0.4, gamma=2.0, alpha=0.25,
                   bbox_reg_beta=0.11, regress_norm=4.0, straddle_thresh=0):
    """cls_logits [B, N, C-1]; box_regression [B, N, 4]; anchors_cat [N, 4]."""
    b = cls_logits.shape[0]
    cls_logits = cls_logits.astype(jnp.float32)
    box_regression = box_regression.astype(jnp.float32)

    def prepare(gt_b, gt_l, gt_v, src, size):
        iou = box_ops.box_iou(anchors_cat, gt_b)
        matches = match_proposals(iou, gt_v, fg_iou, bg_iou, True)
        labels = jnp.where(matches >= 0, gt_l[jnp.clip(matches, 0)], 0)
        labels = jnp.where(matches == -2, -1, labels)
        if straddle_thresh >= 0:
            inside = ((anchors_cat[:, 0] >= -straddle_thresh)
                      & (anchors_cat[:, 1] >= -straddle_thresh)
                      & (anchors_cat[:, 2] < size[1] + straddle_thresh)
                      & (anchors_cat[:, 3] < size[0] + straddle_thresh))
            labels = jnp.where(inside, labels, -1)
        labels = jnp.where(src, labels, -1)  # DA: source-only supervision
        reg = box_ops.encode_boxes(gt_b[jnp.clip(matches, 0)], anchors_cat,
                                   REG_WEIGHTS)
        return labels, reg

    labels, reg_targets = jax.vmap(prepare)(gt_boxes, gt_labels, gt_valid,
                                            is_source, image_sizes)
    pos = labels > 0
    num_pos = jnp.sum(pos)
    per_anchor = sigmoid_focal_loss(cls_logits, labels, gamma, alpha)
    cls_loss = jnp.sum(jnp.where(labels >= 0, per_anchor, 0.0)) / (num_pos + b)
    reg_loss = smooth_l1_loss(box_regression, reg_targets, beta=bbox_reg_beta,
                              weights=pos[..., None].astype(jnp.float32),
                              reduction="sum") / jnp.maximum(
                                  num_pos * regress_norm, 1.0)
    return cls_loss, reg_loss


def retinanet_inference(level_anchors, level_logits, level_regs, image_sizes,
                        *, pre_nms_thresh=0.05, pre_nms_top_n=1000,
                        nms_thresh=0.4, detections_per_img=100, min_size=0,
                        approx_topk=True):
    """Per-level thresh+topk, decode, then cross-level per-class NMS.

    ``approx_topk``: select the per-level pre-NMS candidates with the
    TPU-native ``jax.lax.approx_max_k`` instead of an exact sort. P3 alone
    has ~12M (location, class) scores at 800x1344 and the exact top-k sort
    is 31.8 of the 44.7 ms eval step (profiled); approx_max_k (recall
    target 0.95 *per tile*, misses only tail-of-1000 candidates that
    per-class NMS would discard) removes it. Set TPU.APPROX_TOPK False for
    a reference-exact candidate set."""
    num_classes = level_logits[0].shape[-1] // (
        level_regs[0].shape[-1] // 4)

    def per_level(anchors_l, logits_l, regs_l, size):
        a = regs_l.shape[-1] // 4
        scores = jax.nn.sigmoid(
            logits_l.reshape(-1, a, num_classes).reshape(-1, num_classes)
            .astype(jnp.float32))                                  # [N, C-1]
        regs = regs_l.reshape(-1, a, 4).reshape(-1, 4).astype(jnp.float32)
        flat = scores.reshape(-1)
        n = flat.shape[0]
        cand = flat > pre_nms_thresh
        k = min(pre_nms_top_n, n)
        masked = jnp.where(cand, flat, -1.0)
        if approx_topk and n > 4 * k:
            top_scores, idx = jax.lax.approx_max_k(masked, k)
        else:
            top_scores, idx = jax.lax.top_k(masked, k)
        loc = idx // num_classes
        cls = idx % num_classes + 1
        boxes = box_ops.decode_boxes(regs[loc], anchors_l[loc], REG_WEIGHTS)
        boxes = box_ops.clip_boxes(boxes, size[0], size[1])
        valid = (top_scores > 0) & box_ops.min_size_mask(boxes, min_size)
        return boxes, jnp.where(valid, top_scores, 0.0), cls, valid

    def per_image(args_per_level, size):
        outs = [per_level(a, l, r, size)
                for a, l, r in args_per_level]
        boxes = jnp.concatenate([o[0] for o in outs])
        scores = jnp.concatenate([o[1] for o in outs])
        cls = jnp.concatenate([o[2] for o in outs])
        valid = jnp.concatenate([o[3] for o in outs])
        unit = jnp.max(jnp.where(valid[:, None], boxes, 0.0)) + 1.0
        offset = cls.astype(jnp.float32)[:, None] * unit
        keep_idx, keep_valid = nms_topk(boxes + offset, scores, valid,
                                        nms_thresh, detections_per_img)
        return Detections(boxes=boxes[keep_idx],
                          scores=jnp.where(keep_valid, scores[keep_idx], 0.0),
                          labels=jnp.where(keep_valid, cls[keep_idx], 0),
                          valid=keep_valid)

    b = level_logits[0].shape[0]
    results = []
    for i in range(b):
        args = [(a, lg[i], rg[i]) for a, lg, rg in
                zip(level_anchors, level_logits, level_regs)]
        results.append(per_image(args, image_sizes[i]))
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *results)


class RetinaNet(nn.Module):
    """Meta-architecture: FPN-P3P7 backbone + RetinaNetHead."""

    backbone: nn.Module
    num_classes: int
    num_anchors: int
    anchor_cfg: dict
    loss_cfg: dict
    infer_cfg: dict
    num_convs: int = 4
    prior_prob: float = 0.01
    dtype: Any = jnp.float32
    # device-side normalization constants for uint8 pixel transport
    # (ImageBatch.normalized; float images pass through untouched)
    pixel_mean: tuple = (102.9801, 115.9465, 122.7717)
    pixel_std: tuple = (1.0, 1.0, 1.0)
    to_bgr255: bool = True

    def _pixels(self, batch: ImageBatch) -> jnp.ndarray:
        return batch.normalized(self.pixel_mean, self.pixel_std,
                                self.to_bgr255)

    def setup(self):
        self.head = RetinaNetHead(num_classes=self.num_classes - 1,
                                  num_anchors=self.num_anchors,
                                  num_convs=self.num_convs,
                                  prior_prob=self.prior_prob, dtype=self.dtype)

    def _forward(self, images):
        feats = self.backbone(images)
        logits, regs = self.head(feats)
        gen = AnchorGenerator(**self.anchor_cfg)
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors = [jnp.asarray(a) for a in gen.anchors_for_shapes(shapes)]
        return logits, regs, anchors

    def __call__(self, batch: ImageBatch) -> Detections:
        logits, regs, anchors = self._forward(self._pixels(batch))
        return retinanet_inference(anchors, logits, regs,
                                   batch.sizes.astype(jnp.float32),
                                   **self.infer_cfg)

    def train_forward(self, batch: ImageBatch, targets: Targets, da_state,
                      *unused_domains, aligned: bool = False):
        logits, regs, anchors = self._forward(self._pixels(batch))
        b = batch.batch_size
        nc = self.num_classes - 1
        cls_cat = jnp.concatenate(
            [l.reshape(b, -1, self.num_anchors, nc).reshape(b, -1, nc)
             for l in logits], axis=1)
        reg_cat = jnp.concatenate(
            [r.reshape(b, -1, self.num_anchors, 4).reshape(b, -1, 4)
             for r in regs], axis=1)
        anchors_cat = jnp.concatenate(anchors, axis=0)
        cls_loss, reg_loss = retinanet_loss(
            None, anchors_cat, cls_cat, reg_cat, targets.boxes, targets.labels,
            targets.valid, jnp.ones((b,), bool),
            batch.sizes.astype(jnp.float32), **self.loss_cfg)
        return {"loss_retina_cls": cls_loss,
                "loss_retina_reg": reg_loss}, da_state


def build_retinanet(cfg):
    from .backbone import build_backbone

    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    backbone, spec = build_backbone(cfg)
    from .anchors import retinanet_octave_sizes
    r = cfg.MODEL.RETINANET
    gen = make_anchor_generator_retinanet(cfg)
    octave_sizes = retinanet_octave_sizes(cfg)
    return RetinaNet(
        backbone=backbone,
        num_classes=r.NUM_CLASSES,
        num_anchors=gen.num_anchors_per_location,
        anchor_cfg=dict(sizes=octave_sizes, aspect_ratios=tuple(r.ASPECT_RATIOS),
                        strides=tuple(r.ANCHOR_STRIDES)),
        loss_cfg=dict(fg_iou=r.FG_IOU_THRESHOLD, bg_iou=r.BG_IOU_THRESHOLD,
                      gamma=r.LOSS_GAMMA, alpha=r.LOSS_ALPHA,
                      bbox_reg_beta=r.BBOX_REG_BETA,
                      regress_norm=r.BBOX_REG_WEIGHT,
                      straddle_thresh=r.STRADDLE_THRESH),
        infer_cfg=dict(pre_nms_thresh=r.INFERENCE_TH,
                       pre_nms_top_n=r.PRE_NMS_TOP_N, nms_thresh=r.NMS_TH,
                       detections_per_img=cfg.TEST.DETECTIONS_PER_IMG,
                       approx_topk=cfg.TPU.APPROX_TOPK),
        num_convs=r.NUM_CONVS,
        prior_prob=r.PRIOR_PROB,
        dtype=dtype,
        pixel_mean=tuple(cfg.INPUT.PIXEL_MEAN),
        pixel_std=tuple(cfg.INPUT.PIXEL_STD),
        to_bgr255=cfg.INPUT.TO_BGR255,
    )
