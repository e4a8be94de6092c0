"""Keypoint R-CNN head (reference modeling/roi_heads/keypoint_head/, ~500
LoC; unused by the DA configs — capability parity).

Extractor: 14x14 pooler + 8 3x3 convs of 512 (KeypointRCNNFeatureExtractor);
predictor: deconv x2 + 2x bilinear upsample -> K heatmaps of 56x56
(KeypointRCNNPredictor). Loss: softmax CE over the flattened heatmap of each
visible keypoint of positive ROIs (keypoint_head/loss.py), with GT keypoints
carried as padded [G, K, 3] (x, y, visibility) arrays.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.losses import softmax_cross_entropy

_kaiming_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class KeypointRCNNFeatureExtractor(nn.Module):
    pooler: dict
    layers: tuple = tuple(512 for _ in range(8))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, rois):
        from .poolers import pool_rois
        x = pool_rois(features, rois, **self.pooler)
        b, r = x.shape[:2]
        x = x.reshape((b * r,) + x.shape[2:]).astype(self.dtype)
        for i, ch in enumerate(self.layers):
            x = nn.relu(nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                                kernel_init=_kaiming_fan_out, dtype=self.dtype,
                                name=f"conv_fcn{i + 1}")(x))
        return x.reshape((b, r) + x.shape[1:])


class KeypointRCNNPredictor(nn.Module):
    num_keypoints: int = 17
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, r = x.shape[:2]
        x = x.reshape((b * r,) + x.shape[2:]).astype(self.dtype)
        x = nn.ConvTranspose(self.num_keypoints, (4, 4), strides=(2, 2),
                             padding=((1, 1), (1, 1)),
                             kernel_init=_kaiming_fan_out,
                             name="kps_score_lowres")(x)
        # 2x bilinear upsample (reference interpolate scale_factor=2)
        h, w = x.shape[1:3]
        x = jax.image.resize(x, (x.shape[0], h * 2, w * 2, x.shape[3]),
                             method="bilinear")
        return x.reshape((b, r) + x.shape[1:])


class KeypointHead(nn.Module):
    extractor: nn.Module
    predictor: nn.Module

    def __call__(self, features, rois):
        return self.predictor(self.extractor(features, rois))


def keypoints_to_heatmap_targets(keypoints, rois, heatmap_size: int):
    """keypoints [R, K, 3] (x, y, vis) -> (positions [R, K] flat indices,
    valid [R, K]) in each ROI's heatmap frame
    (reference keypoint_head/loss.py keypoints_to_heat_map)."""
    x1, y1 = rois[:, 0:1], rois[:, 1:2]
    sw = heatmap_size / jnp.maximum(rois[:, 2:3] - rois[:, 0:1], 1e-3)
    sh = heatmap_size / jnp.maximum(rois[:, 3:4] - rois[:, 1:2], 1e-3)
    px = jnp.floor((keypoints[..., 0] - x1) * sw).astype(jnp.int32)
    py = jnp.floor((keypoints[..., 1] - y1) * sh).astype(jnp.int32)
    inb = (px >= 0) & (px < heatmap_size) & (py >= 0) & (py < heatmap_size)
    valid = inb & (keypoints[..., 2] > 0)
    pos = jnp.clip(py, 0, heatmap_size - 1) * heatmap_size + jnp.clip(
        px, 0, heatmap_size - 1)
    return pos, valid


def keypoint_rcnn_loss(kp_head, det_feats, sampled, gt_keypoints, targets):
    """CE over flattened heatmaps of visible keypoints of positive rois."""
    logits = kp_head(det_feats, sampled.rois)    # [B, S, H, H, K]
    hm = logits.shape[2]

    def per_image(lg, s_rois, s_labels, s_valid, s_dom, gt_b, gt_kp, gt_v):
        from ..ops import box_ops
        iou = box_ops.box_iou(s_rois, gt_b)
        iou = jnp.where(gt_v[None, :], iou, -1.0)
        midx = jnp.argmax(iou, axis=1)
        kp = gt_kp[midx]                           # [S, K, 3]
        pos_idx, kp_valid = keypoints_to_heatmap_targets(kp, s_rois, hm)
        roi_ok = (s_labels > 0) & s_valid & s_dom
        w = (kp_valid & roi_ok[:, None]).astype(jnp.float32)
        flat = lg.astype(jnp.float32).reshape(lg.shape[0], hm * hm,
                                              lg.shape[-1])
        flat = jnp.swapaxes(flat, 1, 2)            # [S, K, H*H]
        logp = jax.nn.log_softmax(flat, axis=-1)
        nll = -jnp.take_along_axis(logp, pos_idx[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * w), jnp.sum(w)

    sums, counts = jax.vmap(per_image)(
        logits, sampled.rois, sampled.labels, sampled.valid,
        sampled.domain_mask, targets.boxes, gt_keypoints, targets.valid)
    return jnp.sum(sums) / jnp.maximum(jnp.sum(counts), 1.0)


def heatmaps_to_keypoints(heatmaps, rois):
    """[R, H, H, K] logits + rois [R, 4] -> keypoints [R, K, 3] (x, y, score)
    (reference keypoint inference)."""
    r, h, w, k = heatmaps.shape
    flat = heatmaps.reshape(r, h * w, k)
    idx = jnp.argmax(flat, axis=1)                 # [R, K]
    score = jax.nn.softmax(flat, axis=1)
    score = jnp.take_along_axis(score, idx[:, None, :], axis=1)[:, 0, :]
    py = (idx // w).astype(jnp.float32) + 0.5
    px = (idx % w).astype(jnp.float32) + 0.5
    x1, y1 = rois[:, 0:1], rois[:, 1:2]
    sw = jnp.maximum(rois[:, 2:3] - rois[:, 0:1], 1e-3) / w
    sh = jnp.maximum(rois[:, 3:4] - rois[:, 1:2], 1e-3) / h
    return jnp.stack([px * sw + x1, py * sh + y1, score], axis=-1)


def make_keypoint_head(cfg, dtype):
    from .poolers import pooler_config
    h = cfg.MODEL.ROI_KEYPOINT_HEAD
    pooler = pooler_config(cfg, "ROI_KEYPOINT_HEAD")
    return KeypointHead(
        extractor=KeypointRCNNFeatureExtractor(
            pooler=pooler, layers=tuple(h.CONV_LAYERS), dtype=dtype,
            name="kp_extractor"),
        predictor=KeypointRCNNPredictor(num_keypoints=h.NUM_CLASSES,
                                        dtype=dtype, name="kp_predictor"),
        name="keypoint_head")
