"""ROI box head: feature extractors, predictors, sampling/loss, postprocess.

Re-design of reference modeling/roi_heads/box_head/* with the DA extensions:
* ``subsample`` carries a per-proposal ``domain_mask`` (source=True) and
  zeroes labels for target-domain images so they sample as pure background
  (reference box_head/loss.py:55-130)
* classification/regression losses are masked to source rows
  (loss.py:193-221); the domain mask doubles as the DA instance labels
* the reference re-pools a second "subsample_for_da" set; with <=
  batch_size proposals that resample is the identity set, so we reuse the
  pooled features (the gradient sum is identical — see docstring of
  GeneralizedRCNN.train_forward)
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import box_ops
from ..ops.losses import smooth_l1_loss, softmax_cross_entropy
from ..ops.matcher import match_proposals
from ..ops.nms import nms_topk
from ..ops.sampler import balanced_sample, selection_to_indices
from .backbone.resnet import ResNetHead
from .poolers import pool_rois

_normal001 = nn.initializers.normal(0.01)
_normal0001 = nn.initializers.normal(0.001)
_kaiming_a1 = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")


# ---------------------------------------------------------------------------
# feature extractors (reference roi_box_feature_extractors.py)
# ---------------------------------------------------------------------------

class ResNet50Conv5ROIFeatureExtractor(nn.Module):
    """C4: pool 14x14 from the single C4 map, run res5 -> [.., 7, 7, 2048]
    (reference roi_box_feature_extractors.py:13-45)."""

    pooler: dict
    depth: int = 50
    num_groups: int = 1
    width_per_group: int = 64
    res2_out_channels: int = 256
    stride_in_1x1: bool = True
    dilation: int = 1
    norm: str = "frozen_bn"
    remat: bool = False
    remat_level: str = "block"
    grouped_dense_max_width: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, rois):
        x = pool_rois(features, rois, **self.pooler)        # [B, R, 14, 14, C]
        b, r = x.shape[:2]
        x = x.reshape((b * r,) + x.shape[2:])
        x = ResNetHead(depth=self.depth, num_groups=self.num_groups,
                       width_per_group=self.width_per_group,
                       res2_out_channels=self.res2_out_channels,
                       stride_in_1x1=self.stride_in_1x1,
                       first_stride=2 if self.dilation == 1 else 1,
                       dilation=self.dilation, norm=self.norm,
                       remat=self.remat, remat_level=self.remat_level,
                       grouped_dense_max_width=self.grouped_dense_max_width,
                       dtype=self.dtype, name="head")(x)
        return x.reshape((b, r) + x.shape[1:])              # [B, R, 7, 7, 2048]


class FPN2MLPFeatureExtractor(nn.Module):
    """FPN: pool 7x7 multi-level, 2 FC relu (reference :48-79)."""

    pooler: dict
    mlp_dim: int = 1024
    use_gn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, rois):
        x = pool_rois(features, rois, **self.pooler)        # [B, R, 7, 7, C]
        b, r = x.shape[:2]
        x = x.reshape(b, r, -1)
        x = nn.relu(nn.Dense(self.mlp_dim, kernel_init=_kaiming_a1,
                             dtype=self.dtype, name="fc6")(x))
        x = nn.relu(nn.Dense(self.mlp_dim, kernel_init=_kaiming_a1,
                             dtype=self.dtype, name="fc7")(x))
        return x                                            # [B, R, mlp_dim]


class FPNXconv1fcFeatureExtractor(nn.Module):
    """FPN: 4 convs (+optional GN) then one FC (reference :82-142)."""

    pooler: dict
    conv_dim: int = 256
    num_stacked_convs: int = 4
    mlp_dim: int = 1024
    use_gn: bool = False
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, rois):
        from ..layers import make_norm
        x = pool_rois(features, rois, **self.pooler)
        b, r = x.shape[:2]
        x = x.reshape((b * r,) + x.shape[2:])
        for i in range(self.num_stacked_convs):
            x = nn.Conv(self.conv_dim, (3, 3), padding=((self.dilation,) * 2,) * 2,
                        kernel_dilation=(self.dilation,) * 2,
                        use_bias=not self.use_gn,
                        kernel_init=_normal001, dtype=self.dtype,
                        name=f"xconvs{i}")(x)
            if self.use_gn:
                x = make_norm("gn", name=f"xconvs{i}_gn")(x)
            x = nn.relu(x)
        x = x.reshape(b, r, -1)
        x = nn.relu(nn.Dense(self.mlp_dim, kernel_init=_kaiming_a1,
                             dtype=self.dtype, name="fc6")(x))
        return x


# ---------------------------------------------------------------------------
# predictors (reference roi_box_predictors.py:6-61)
# ---------------------------------------------------------------------------

class FastRCNNPredictor(nn.Module):
    """C4 predictor: global avgpool + linear cls/bbox heads."""

    num_classes: int
    cls_agnostic: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x [B, R, 7, 7, 2048] -> avgpool
        x = jnp.mean(x, axis=(-3, -2))
        num_bbox = 2 if self.cls_agnostic else self.num_classes
        logits = nn.Dense(self.num_classes, kernel_init=_normal001,
                          dtype=self.dtype, name="cls_score")(x)
        deltas = nn.Dense(num_bbox * 4, kernel_init=_normal0001,
                          dtype=self.dtype, name="bbox_pred")(x)
        return logits, deltas


class FPNPredictor(nn.Module):
    num_classes: int
    cls_agnostic: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        num_bbox = 2 if self.cls_agnostic else self.num_classes
        logits = nn.Dense(self.num_classes, kernel_init=_normal001,
                          dtype=self.dtype, name="cls_score")(x)
        deltas = nn.Dense(num_bbox * 4, kernel_init=_normal0001,
                          dtype=self.dtype, name="bbox_pred")(x)
        return logits, deltas


# ---------------------------------------------------------------------------
# training-time sampling + losses
# ---------------------------------------------------------------------------

class SampledRois(NamedTuple):
    rois: jnp.ndarray         # [B, S, 4]
    valid: jnp.ndarray        # [B, S]
    labels: jnp.ndarray       # [B, S] int32 class (0 = bg)
    reg_targets: jnp.ndarray  # [B, S, 4]
    domain_mask: jnp.ndarray  # [B, S] bool (True = source image)


def subsample_proposals(key, proposals_boxes, proposals_valid, gt_boxes,
                        gt_labels, gt_valid, is_source, *, fg_iou, bg_iou,
                        batch_per_image, positive_fraction, reg_weights,
                        approx_topk=False):
    """Reference FastRCNNLossComputation.subsample, fixed-shape.

    proposals_* [B, P(, 4)]; gt_* [B, G(, 4)]; is_source [B].
    Returns SampledRois with S = batch_per_image.
    """

    def per_image(k, pb, pv, gb, gl, gv, src):
        iou = box_ops.box_iou(pb, gb)                       # [P, G]
        iou = jnp.where(pv[:, None], iou, -1.0)
        matches = match_proposals(iou, gv, fg_iou, bg_iou, False)
        matched_gt = gb[jnp.clip(matches, 0)]
        labels = gl[jnp.clip(matches, 0)]
        labels = jnp.where(matches == -1, 0, labels)        # below low -> bg
        labels = jnp.where(matches == -2, -1, labels)       # between -> ignore
        labels = jnp.where(pv, labels, -1)                  # padded -> ignore
        # target-domain image: everything becomes background so sampling picks
        # an unsupervised subset (box_head/loss.py:85-88)
        labels = jnp.where(src, labels, jnp.where(pv, 0, -1))
        reg = box_ops.encode_boxes(matched_gt, pb, reg_weights)
        pos_m, neg_m = balanced_sample(k, labels, batch_per_image,
                                       positive_fraction, approx=approx_topk)
        idx, is_pos, valid = selection_to_indices(pos_m, neg_m, batch_per_image)
        return SampledRois(
            rois=pb[idx],
            valid=valid,
            labels=jnp.where(is_pos, labels[idx], 0),
            reg_targets=reg[idx],
            domain_mask=jnp.broadcast_to(src, valid.shape) & valid,
        )

    keys = jax.random.split(key, proposals_boxes.shape[0])
    return jax.vmap(per_image)(keys, proposals_boxes, proposals_valid, gt_boxes,
                               gt_labels, gt_valid, is_source)


def fast_rcnn_loss(class_logits, box_regression, sampled: SampledRois,
                   cls_agnostic: bool = False):
    """Reference FastRCNNLossComputation.__call__ (loss.py:165-221): losses
    over *source* rows only; normalizer = number of source rows."""
    logits = class_logits.reshape(-1, class_logits.shape[-1]).astype(jnp.float32)
    deltas = box_regression.reshape(-1, box_regression.shape[-1]).astype(jnp.float32)
    labels = sampled.labels.reshape(-1)
    reg_targets = sampled.reg_targets.reshape(-1, 4)
    dom = (sampled.domain_mask & sampled.valid).reshape(-1)

    w = dom.astype(jnp.float32)
    cls_loss = softmax_cross_entropy(logits, labels, w)

    pos = dom & (labels > 0)
    if cls_agnostic:
        pos_deltas = deltas[:, 4:8]
    else:
        idx = 4 * labels[:, None] + jnp.arange(4)[None, :]
        pos_deltas = jnp.take_along_axis(deltas, idx, axis=1)
    n_dom = jnp.maximum(jnp.sum(w), 1.0)
    box_loss = smooth_l1_loss(pos_deltas, reg_targets, beta=1.0,
                              weights=pos[:, None].astype(jnp.float32),
                              reduction="sum") / n_dom
    return cls_loss, box_loss


# ---------------------------------------------------------------------------
# inference post-processing (reference box_head/inference.py:12-160)
# ---------------------------------------------------------------------------

class Detections(NamedTuple):
    boxes: jnp.ndarray   # [B, D, 4]
    scores: jnp.ndarray  # [B, D]
    labels: jnp.ndarray  # [B, D] int32 (1..C-1)
    valid: jnp.ndarray   # [B, D]


def postprocess_detections(class_logits, box_regression, proposal_boxes,
                           proposal_valid, image_sizes, *, score_thresh,
                           nms_thresh, detections_per_img, reg_weights,
                           cls_agnostic=False, pre_nms_candidates=2048):
    """Softmax -> per-class decode -> threshold -> per-class NMS (via the
    class-offset trick, equivalent to the reference's per-class loop) ->
    top detections_per_img."""
    num_classes = class_logits.shape[-1]

    def per_image(logits, deltas, pb, pv, size):
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)  # [P, C]
        if cls_agnostic:
            boxes1 = box_ops.decode_boxes(deltas.astype(jnp.float32)[:, 4:8],
                                          pb, reg_weights)
            boxes = jnp.tile(boxes1[:, None, :], (1, num_classes, 1))
        else:
            boxes = box_ops.decode_boxes(
                deltas.astype(jnp.float32), pb, reg_weights
            ).reshape(-1, num_classes, 4)                    # [P, C, 4]
        boxes = box_ops.clip_boxes(boxes, size[0], size[1])

        # drop background column, flatten (box, class) pairs
        cls_ids = jnp.broadcast_to(jnp.arange(num_classes), probs.shape)
        flat_scores = probs[:, 1:].reshape(-1)
        flat_boxes = boxes[:, 1:, :].reshape(-1, 4)
        flat_cls = cls_ids[:, 1:].reshape(-1)
        flat_valid = jnp.broadcast_to(pv[:, None], probs[:, 1:].shape).reshape(-1)
        flat_valid = flat_valid & (flat_scores > score_thresh)

        k = min(pre_nms_candidates, flat_scores.shape[0])
        top_scores, top_idx = jax.lax.top_k(
            jnp.where(flat_valid, flat_scores, -1.0), k)
        cand_boxes = flat_boxes[top_idx]
        cand_cls = flat_cls[top_idx]
        cand_valid = top_scores > 0.0
        # per-class NMS via coordinate offset; offset unit = max coordinate
        # + 1 (a huge constant would eat float32 precision for high classes)
        unit = jnp.max(jnp.where(cand_valid[:, None], cand_boxes, 0.0)) + 1.0
        offset = cand_cls.astype(jnp.float32)[:, None] * unit
        keep_idx, keep_valid = nms_topk(cand_boxes + offset, top_scores,
                                        cand_valid, nms_thresh,
                                        min(detections_per_img, k))
        return Detections(
            boxes=cand_boxes[keep_idx],
            scores=jnp.where(keep_valid, top_scores[keep_idx], 0.0),
            labels=jnp.where(keep_valid, cand_cls[keep_idx], 0),
            valid=keep_valid)

    return jax.vmap(per_image)(class_logits, box_regression, proposal_boxes,
                               proposal_valid, image_sizes)


# ---------------------------------------------------------------------------
# factories
# ---------------------------------------------------------------------------

def make_box_feature_extractor(cfg, dtype):
    from .poolers import pooler_config
    name = cfg.MODEL.ROI_BOX_HEAD.FEATURE_EXTRACTOR
    h = cfg.MODEL.ROI_BOX_HEAD
    pooler = pooler_config(cfg, "ROI_BOX_HEAD")
    r = cfg.MODEL.RESNETS
    if name == "ResNet50Conv5ROIFeatureExtractor":
        return ResNet50Conv5ROIFeatureExtractor(
            pooler=pooler, depth=50, num_groups=r.NUM_GROUPS,
            width_per_group=r.WIDTH_PER_GROUP,
            res2_out_channels=r.RES2_OUT_CHANNELS,
            stride_in_1x1=r.STRIDE_IN_1X1, dilation=h.DILATION,
            norm="gn" if h.USE_GN else "frozen_bn",
            remat=cfg.TPU.REMAT_ROI_HEAD,
            remat_level=cfg.TPU.REMAT_LEVEL,
            grouped_dense_max_width=cfg.TPU.GROUPED_DENSE_MAX_WIDTH,
            dtype=dtype,
            name="feature_extractor"), r.RES2_OUT_CHANNELS * 8
    if name == "FPN2MLPFeatureExtractor":
        return FPN2MLPFeatureExtractor(
            pooler=pooler, mlp_dim=h.MLP_HEAD_DIM, use_gn=h.USE_GN,
            dtype=dtype, name="feature_extractor"), h.MLP_HEAD_DIM
    if name == "FPNXconv1fcFeatureExtractor":
        return FPNXconv1fcFeatureExtractor(
            pooler=pooler, conv_dim=h.CONV_HEAD_DIM,
            num_stacked_convs=h.NUM_STACKED_CONVS, mlp_dim=h.MLP_HEAD_DIM,
            use_gn=h.USE_GN, dilation=h.DILATION, dtype=dtype,
            name="feature_extractor"), h.MLP_HEAD_DIM
    if name == "FBNet.roi_head":
        from .backbone.fbnet import make_fbnet_roi_head
        return make_fbnet_roi_head(cfg, dtype)
    raise KeyError(f"unknown feature extractor: {name}")


def make_box_predictor(cfg, dtype):
    name = cfg.MODEL.ROI_BOX_HEAD.PREDICTOR
    nc = cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES
    agn = cfg.MODEL.CLS_AGNOSTIC_BBOX_REG
    if name == "FastRCNNPredictor":
        return FastRCNNPredictor(num_classes=nc, cls_agnostic=agn, dtype=dtype,
                                 name="predictor")
    if name == "FPNPredictor":
        return FPNPredictor(num_classes=nc, cls_agnostic=agn, dtype=dtype,
                            name="predictor")
    raise KeyError(f"unknown predictor: {name}")
