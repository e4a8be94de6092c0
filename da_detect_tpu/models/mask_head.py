"""Mask R-CNN head (reference modeling/roi_heads/mask_head/, ~600 LoC).

Capability-parity port, TPU-shaped:
* feature extractor: shares the box extractor's res5 output (C4,
  SHARE_BOX_FEATURE_EXTRACTOR) or its own 14x14 pooler + 4 convs (FPN)
* predictor: 2x deconv + per-class 1x1 logits (MaskRCNNC4Predictor)
* training targets: instead of the reference's lazy polygon cropping
  (mask_head/loss.py project_masks_on_boxes), GT masks arrive pre-rasterized
  in their own gt-box frame ([G, M, M], see structures.Targets) and are
  projected into each positive proposal's frame by a bilinear affine
  resample — fixed shapes, no host round-trip.
* loss: BCE over the GT-class mask channel of positive source-domain rows
  (reference mask_head/loss.py:110-144).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.losses import bce_with_logits

_normal001 = nn.initializers.normal(0.01)
_kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class MaskRCNNC4Predictor(nn.Module):
    num_classes: int
    dim_reduced: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x [B, R, H, W, C] -> deconv 2x -> 1x1 logits per class
        b, r = x.shape[:2]
        x = x.reshape((b * r,) + x.shape[2:]).astype(self.dtype)
        x = nn.ConvTranspose(self.dim_reduced, (2, 2), strides=(2, 2),
                             kernel_init=_kaiming, name="conv5_mask")(x)
        x = nn.relu(x)
        x = nn.Conv(self.num_classes, (1, 1), kernel_init=_kaiming,
                    name="mask_fcn_logits")(x)
        return x.reshape((b, r) + x.shape[1:])


class MaskRCNNConv1x1Predictor(nn.Module):
    """1x1 per-class logits, no deconv (reference roi_mask_predictors.py
    MaskRCNNConv1x1Predictor; the fbnet mask configs select it — their mask
    stage already upsamples to RESOLUTION)."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, r = x.shape[:2]
        x = x.reshape((b * r,) + x.shape[2:]).astype(self.dtype)
        x = nn.Conv(self.num_classes, (1, 1), kernel_init=_kaiming,
                    name="mask_fcn_logits")(x)
        return x.reshape((b, r) + x.shape[1:])


class MaskRCNNFPNFeatureExtractor(nn.Module):
    """14x14 pooler + 4 3x3 convs (reference roi_mask_feature_extractors.py)."""

    pooler: dict
    layers: tuple = (256, 256, 256, 256)
    dilation: int = 1
    use_gn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, rois):
        from ..layers import make_norm
        from .poolers import pool_rois
        x = pool_rois(features, rois, **self.pooler)
        b, r = x.shape[:2]
        x = x.reshape((b * r,) + x.shape[2:]).astype(self.dtype)
        for i, ch in enumerate(self.layers):
            x = nn.Conv(ch, (3, 3), padding=((self.dilation,) * 2,) * 2,
                        kernel_dilation=(self.dilation,) * 2,
                        use_bias=not self.use_gn, kernel_init=_kaiming,
                        name=f"mask_fcn{i + 1}")(x)
            if self.use_gn:
                x = make_norm("gn", name=f"mask_fcn{i + 1}_gn")(x)
            x = nn.relu(x)
        return x.reshape((b, r) + x.shape[1:])


class MaskHead(nn.Module):
    """Composite: (optional) extractor + predictor."""

    predictor: nn.Module
    extractor: nn.Module | None  # None => share box features (C4)

    def __call__(self, features, rois, shared_box_features=None):
        if self.extractor is None:
            x = shared_box_features
        else:
            x = self.extractor(features, rois)
        return self.predictor(x)


def project_gt_masks(gt_masks, gt_boxes, proposal_boxes, out_size: int):
    """Resample GT masks (in gt-box frames) into proposal frames.

    gt_masks [G, M, M]; gt_boxes [G, 4]; proposal_boxes [R, 4] with matched
    gt per proposal already gathered (so G == R here). Returns [R, out, out].
    """
    m = gt_masks.shape[-1]

    def one(mask, gb, pb):
        gw = jnp.maximum(gb[2] - gb[0], 1e-3)
        gh = jnp.maximum(gb[3] - gb[1], 1e-3)
        ys = (jnp.linspace(pb[1], pb[3], out_size) - gb[1]) / gh * (m - 1)
        xs = (jnp.linspace(pb[0], pb[2], out_size) - gb[0]) / gw * (m - 1)

        def axis_w(coords):
            pos = jnp.arange(m, dtype=jnp.float32)
            w = jnp.maximum(0.0, 1.0 - jnp.abs(coords[:, None] - pos))
            inb = (coords >= 0) & (coords <= m - 1)
            return w * inb[:, None]

        wy = axis_w(ys)                     # [out, M]
        wx = axis_w(xs)
        return wy @ mask @ wx.T             # [out, out]

    return jax.vmap(one)(gt_masks, gt_boxes, proposal_boxes)


def mask_rcnn_loss(mask_head, det_feats, sampled, targets,
                   shared_box_features=None):
    """BCE over positive source rows' GT-class channel."""
    if targets.masks is None:
        return jnp.asarray(0.0, jnp.float32)
    logits = mask_head(det_feats, sampled.rois, shared_box_features)  # [B,S,Hm,Wm,C]
    out_size = logits.shape[2]

    def per_image(lg, s_rois, s_labels, s_valid, s_dom, gt_b, gt_m, gt_v):
        # re-match each sampled roi to its best gt by IoU (the sampled struct
        # does not carry matched indices; positives have IoU>=0.5 so argmax
        # recovers the assignment)
        from ..ops import box_ops
        iou = box_ops.box_iou(s_rois, gt_b)
        iou = jnp.where(gt_v[None, :], iou, -1.0)
        midx = jnp.argmax(iou, axis=1)
        proj = project_gt_masks(gt_m[midx], gt_b[midx], s_rois, out_size)
        # gather the GT-class channel BEFORE the f32 cast: the channel
        # gather lowers to a one-hot contraction over [S, 28, 28, C], and
        # materializing that in f32 first costs ~4 ms/step at COCO shapes
        cls_logits = jnp.take_along_axis(
            lg, s_labels[:, None, None, None].clip(0),
            axis=-1)[..., 0].astype(jnp.float32)
        pos = (s_labels > 0) & s_valid & s_dom
        w = jnp.broadcast_to(pos[:, None, None], cls_logits.shape).astype(jnp.float32)
        return (bce_with_logits(cls_logits, (proj > 0.5).astype(jnp.float32),
                                weights=w, reduction="sum"),
                jnp.sum(w))

    sums, counts = jax.vmap(per_image)(
        logits, sampled.rois, sampled.labels, sampled.valid,
        sampled.domain_mask, targets.boxes, targets.masks, targets.valid)
    return jnp.sum(sums) / jnp.maximum(jnp.sum(counts), 1.0)


def make_mask_head(cfg, dtype):
    h = cfg.MODEL.ROI_MASK_HEAD
    nc = cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES
    if h.PREDICTOR == "MaskRCNNC4Predictor":
        predictor = MaskRCNNC4Predictor(
            num_classes=nc,
            dim_reduced=h.CONV_LAYERS[-1] if h.CONV_LAYERS else 256,
            dtype=dtype, name="mask_predictor")
    elif h.PREDICTOR == "MaskRCNNConv1x1Predictor":
        predictor = MaskRCNNConv1x1Predictor(num_classes=nc, dtype=dtype,
                                             name="mask_predictor")
    else:
        raise KeyError(f"unknown mask predictor: {h.PREDICTOR}")
    if h.SHARE_BOX_FEATURE_EXTRACTOR:
        extractor = None
    elif h.FEATURE_EXTRACTOR == "FBNet.roi_head_mask":
        from .backbone.fbnet import make_fbnet_mask_extractor
        extractor = make_fbnet_mask_extractor(cfg, dtype)
    elif h.FEATURE_EXTRACTOR in ("MaskRCNNFPNFeatureExtractor",
                                 "ResNet50Conv5ROIFeatureExtractor"):
        # the C4 path shares the box extractor via SHARE_BOX_FEATURE_EXTRACTOR
        from .poolers import pooler_config
        pooler = pooler_config(cfg, "ROI_MASK_HEAD")
        extractor = MaskRCNNFPNFeatureExtractor(
            pooler=pooler, layers=tuple(h.CONV_LAYERS), dilation=h.DILATION,
            use_gn=h.USE_GN, dtype=dtype, name="mask_extractor")
    else:
        raise KeyError(f"unknown mask extractor: {h.FEATURE_EXTRACTOR}")
    return MaskHead(predictor=predictor, extractor=extractor, name="mask_head")
