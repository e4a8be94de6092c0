"""GeneralizedRCNN — the meta-architecture.

Re-design of reference modeling/detector/generalized_rcnn.py:37-156. The
whole training forward (backbone -> RPN -> ROI heads -> DA heads) is one pure
function suitable for a single jitted SPMD train step (SURVEY §7.1).

Batch layout conventions (made explicit instead of the reference's implicit
source-first ordering):
* source_only: B images, all is_source=True
* da:         B = 2k, [k source | k target]
* da_triplet: B = 3k, [k source | k positive-target | k negative-target]
  — detection/DA-img losses use the first 2k (reference
  generalized_rcnn.py:96-104), the image-level triplet uses the level-0
  features of all three slices (:90-95), and the aligned instance triplet
  re-pools the positive slice's proposals from each domain's features
  (:109-114).

One deliberate deviation: the reference pools the DA instance features in a
*second* feature-extractor pass over (effectively) the same sampled
proposals (box_head.py:102-110 + loss.py:132-163 — with <= batch_size
proposals the "resample" is the identity set). The forward values are
identical and gradients are additive, so we reuse the pooled features; the
total gradient matches the reference while saving a full ROI-head pass.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..structures.image_batch import ImageBatch, Targets
from .anchors import AnchorGenerator, make_anchor_generator
from .box_head import (Detections, fast_rcnn_loss, make_box_feature_extractor,
                       make_box_predictor, postprocess_detections,
                       subsample_proposals)
from .da import DAState, make_da_heads
from .keypoint_head import keypoint_rcnn_loss, make_keypoint_head
from .mask_head import make_mask_head, mask_rcnn_loss
from .rpn import (RPNHead, append_gt_proposals, rpn_config, rpn_loss,
                  select_proposals)


class GeneralizedRCNN(nn.Module):
    backbone: nn.Module
    feature_extractor: Optional[nn.Module]
    predictor: Optional[nn.Module]
    da_heads: Optional[nn.Module]
    mask_head: Optional[nn.Module]
    keypoint_head: Optional[nn.Module]
    rpn_only: bool
    num_anchors: int
    anchor_sizes: tuple
    aspect_ratios: tuple
    anchor_strides: tuple
    straddle_thresh: int
    rpn_train: dict
    rpn_test: dict
    rpn_loss_cfg: dict
    sample_cfg: dict
    post_cfg: dict
    rpn_head_module: Optional[nn.Module] = None
    share_positive_pool: bool = False
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
        # custom head (e.g. FBNet.rpn_head) or the standard 3x3-conv head
        if self.rpn_head_module is not None:
            self.rpn_head = self.rpn_head_module
        else:
            self.rpn_head = RPNHead(num_anchors=self.num_anchors,
                                    dtype=self.dtype)

    # -- shared trunk ------------------------------------------------------
    def _features_and_rpn(self, images):
        feats = self.backbone(images)
        logits, deltas = self.rpn_head(feats)
        gen = AnchorGenerator(self.anchor_sizes, self.aspect_ratios,
                              self.anchor_strides)
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors = [jnp.asarray(a) for a in gen.anchors_for_shapes(shapes)]
        return feats, logits, deltas, anchors

    # -- inference ---------------------------------------------------------
    def __call__(self, batch: ImageBatch, with_masks: bool = False,
                 with_keypoints: bool = False):
        feats, logits, deltas, anchors = self._features_and_rpn(
            self._pixels(batch))
        props = select_proposals(anchors, logits, deltas,
                                 batch.sizes.astype(jnp.float32),
                                 **self.rpn_test)
        if self.rpn_only:
            # proposals-as-detections (reference RPN_ONLY eval path)
            return Detections(boxes=props.boxes, scores=props.scores,
                              labels=jnp.where(props.valid, 1, 0),
                              valid=props.valid)
        x = self.feature_extractor(feats, props.boxes)
        cls_logits, box_deltas = self.predictor(x)
        dets = postprocess_detections(cls_logits, box_deltas, props.boxes,
                                      props.valid,
                                      batch.sizes.astype(jnp.float32),
                                      **self.post_cfg)
        if with_masks and self.mask_head is not None:
            # second pass over the final detections (reference mask_head eval
            # path runs the mask head on the box head's results)
            shared = (self.feature_extractor(feats, dets.boxes)
                      if self.mask_head.extractor is None else None)
            mask_logits = self.mask_head(feats, dets.boxes, shared)
            # per-detection GT-class channel, sigmoid probs [B, D, Hm, Wm]
            # (gather before the f32 cast — see mask_rcnn_loss)
            probs = jax.nn.sigmoid(jnp.take_along_axis(
                mask_logits,
                dets.labels[:, :, None, None, None].clip(0),
                axis=-1)[..., 0].astype(jnp.float32))
            return dets, probs
        if with_keypoints and self.keypoint_head is not None:
            # second pass over the final detections, mirroring the reference
            # keypoint eval flow (roi_heads/keypoint_head/inference.py:1-80:
            # heatmap argmax decoded back to image coordinates)
            from .keypoint_head import heatmaps_to_keypoints
            kp_logits = self.keypoint_head(feats, dets.boxes)  # [B,D,H,H,K]
            kps = jax.vmap(heatmaps_to_keypoints)(
                kp_logits.astype(jnp.float32), dets.boxes)      # [B,D,K,3]
            return dets, kps
        return dets

    # -- training ----------------------------------------------------------
    def _rpn_and_proposals(self, batch, targets, append_gt: bool):
        feats, logits, deltas, anchors = self._features_and_rpn(
            self._pixels(batch))
        sizes = batch.sizes.astype(jnp.float32)
        # proposal selection runs without gradients (reference rpn.py:114-117
        # wraps box_selector_train in no_grad)
        sg = jax.lax.stop_gradient
        props = select_proposals(anchors, [sg(l) for l in logits],
                                 [sg(d) for d in deltas], sizes,
                                 **self.rpn_train)
        if append_gt:
            props = append_gt_proposals(props, targets.boxes, targets.valid,
                                        batch.is_source)
        return feats, logits, deltas, anchors, props

    def _subsample_and_extract(self, key, feats, props, targets, is_source):
        sampled = subsample_proposals(
            key, props.boxes, props.valid, targets.boxes, targets.labels,
            targets.valid, is_source, **self.sample_cfg)
        x = self.feature_extractor(feats, sampled.rois)
        return sampled, x

    def train_forward(self, batch_s: ImageBatch, targets_s: Targets,
                      da_state: DAState, batch_t: ImageBatch = None,
                      targets_t: Targets = None, batch_n: ImageBatch = None,
                      targets_n: Targets = None, *, aligned: bool = False,
                      deterministic: bool = False):
        """Returns (losses dict, new DAState).

        Domain slices arrive as separate [k, ...] batches (source / positive
        target / negative target) so data-parallel sharding keeps triple i on
        one device with no cross-device slicing. Passing only ``batch_s`` is
        source-only training; + ``batch_t`` is classic 2-domain DA; + both is
        the triplet path. Per-domain backbone/ROI passes skip the work the
        reference masks out afterwards (loss-equivalent, fewer FLOPs).
        """
        b = batch_s.batch_size
        mode = ("da_triplet" if batch_n is not None
                else "da" if batch_t is not None else "source_only")

        rpn_key = self.make_rng("sampling")
        sub_key = self.make_rng("sampling")

        feats_s, logits_s, deltas_s, anchors, props_s = self._rpn_and_proposals(
            batch_s, targets_s, append_gt=True)

        # RPN supervision is source-only (reference rpn/loss.py:57-98 skips
        # target images; running it on the source slice alone is equivalent)
        anchors_cat = jnp.concatenate(anchors, axis=0)
        obj_cat = jnp.concatenate([l.reshape(b, -1) for l in logits_s], axis=1)
        dl_cat = jnp.concatenate(
            [d.reshape(b, -1, self.num_anchors, 4).reshape(b, -1, 4)
             for d in deltas_s], axis=1)
        loss_obj, loss_rpn_box = rpn_loss(
            rpn_key, anchors_cat, obj_cat, dl_cat, targets_s.boxes,
            targets_s.valid, jnp.ones((b,), bool),
            batch_s.sizes.astype(jnp.float32), **self.rpn_loss_cfg)

        if self.rpn_only:
            return {"loss_objectness": loss_obj,
                    "loss_rpn_box_reg": loss_rpn_box}, da_state

        sampled_s, x_s = self._subsample_and_extract(
            sub_key, feats_s, props_s, targets_s, jnp.ones((b,), bool))
        cls_logits, box_deltas = self.predictor(x_s)
        loss_cls, loss_box = fast_rcnn_loss(
            cls_logits, box_deltas, sampled_s,
            cls_agnostic=self.post_cfg["cls_agnostic"])

        losses = {
            "loss_objectness": loss_obj,
            "loss_rpn_box_reg": loss_rpn_box,
            "loss_classifier": loss_cls,
            "loss_box_reg": loss_box,
        }

        if self.mask_head is not None:
            losses["loss_mask"] = mask_rcnn_loss(
                self.mask_head, feats_s, sampled_s, targets_s,
                shared_box_features=x_s)
        if self.keypoint_head is not None and targets_s.keypoints is not None:
            losses["loss_kp"] = keypoint_rcnn_loss(
                self.keypoint_head, feats_s, sampled_s, targets_s.keypoints,
                targets_s)

        new_state = da_state
        if self.da_heads is not None and mode != "source_only":
            tgt_key = self.make_rng("sampling")
            feats_t, _, _, _, props_t = self._rpn_and_proposals(
                batch_t, targets_t, append_gt=False)
            sampled_t, x_t = self._subsample_and_extract(
                tgt_key, feats_t, props_t, targets_t, jnp.zeros((b,), bool))

            # Instance + image features of both domains for the DA heads.
            # INTERLEAVE (s0,t0,s1,t1,...) instead of concatenating the
            # domain halves: under data-parallel sharding a concat along the
            # batch axis re-distributes rows across devices (XLA inserts an
            # all-to-all per tensor), while stack(axis=1)+reshape keeps every
            # device's rows contiguous — zero communication. All DA losses
            # are row-mask-based and permutation-invariant, so the values
            # are unchanged.
            def _ilv(a_s, a_t):
                return jnp.stack([a_s, a_t], axis=1).reshape(
                    (2 * a_s.shape[0],) + a_s.shape[1:])

            da_ins_feas = _ilv(x_s, x_t)
            ins_valid = _ilv(sampled_s.valid, sampled_t.valid)
            dom_mask = _ilv(sampled_s.valid, jnp.zeros_like(sampled_t.valid))
            det_feats = [_ilv(fs, ft) for fs, ft in zip(feats_s, feats_t)]
            is_source_det = _ilv(jnp.ones((b,), bool), jnp.zeros((b,), bool))

            img_fea_set = None
            da_ins_set = None
            if mode == "da_triplet":
                feats_n = self.backbone(self._pixels(batch_n))
                img_fea_set = (feats_s[0], feats_t[0], feats_n[0])
                if aligned:
                    # pool the positive slice's proposals from each domain's
                    # features (reference generalized_rcnn.py:109-114),
                    # independent subsample per pass. With
                    # share_positive_pool (TPU.SHARE_POSITIVE_POOL) the
                    # positive member reuses the detection pass's pooled
                    # target features (x_t): same features, same proposal
                    # set, same subsample distribution — only the RNG draw
                    # is shared with the DA-ins loss instead of independent,
                    # saving one full ROI-head pass per step
                    # one extractor pass PER member, not one batched pass:
                    # batching the members into a single [m*k, R] call was
                    # measured slower twice (68.2 ms r1, 66.3 ms r2 vs 64.8
                    # sequential — this chip prefers per-domain batch-1 conv
                    # programs; PERFORMANCE.md "Aligned-triplet variant")
                    da_ins_set = []
                    for fd, tg, src, is_pos in (
                            (feats_s, targets_s, True, False),
                            (feats_t, targets_t, False, True),
                            (feats_n, targets_n, False, False)):
                        if self.share_positive_pool and is_pos:
                            da_ins_set.append(x_t)
                            continue
                        d_key = self.make_rng("sampling")
                        samp = subsample_proposals(
                            d_key, props_t.boxes, props_t.valid, tg.boxes,
                            tg.labels, tg.valid, jnp.full((b,), src),
                            **self.sample_cfg)
                        da_ins_set.append(self.feature_extractor(fd, samp.rois))
                    da_ins_set = tuple(da_ins_set)

            da_losses, new_state = self.da_heads(
                det_feats, da_ins_feas, dom_mask, ins_valid, da_ins_set,
                img_fea_set, is_source_det, da_state,
                deterministic=deterministic)
            losses.update(da_losses)

        return losses, new_state


def build_detection_model(cfg):
    """Reference modeling/detector/detectors.py:8-10 equivalent; also
    dispatches the RetinaNet and RPN-only meta-architectures."""
    from .backbone import build_backbone

    if cfg.MODEL.RETINANET_ON:
        if cfg.MODEL.DOMAIN_ADAPTATION_ON:
            # fail loudly: RetinaNet has no DA integration (true of the
            # reference too) — silently training source-only while the user
            # believes DA is active would be worse than an error
            raise ValueError(
                "MODEL.RETINANET_ON and MODEL.DOMAIN_ADAPTATION_ON are "
                "mutually exclusive: the RetinaNet meta-architecture has no "
                "domain-adaptation heads (same as the reference)")
        from .retinanet import build_retinanet
        return build_retinanet(cfg)

    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    backbone, spec = build_backbone(cfg)
    if cfg.MODEL.RPN_ONLY:
        extractor, predictor = None, None
    else:
        extractor, _ = make_box_feature_extractor(cfg, dtype)
        predictor = make_box_predictor(cfg, dtype)
    da = make_da_heads(cfg, dtype) if cfg.MODEL.DOMAIN_ADAPTATION_ON else None
    mask = make_mask_head(cfg, dtype) if cfg.MODEL.MASK_ON else None
    kp = make_keypoint_head(cfg, dtype) if cfg.MODEL.KEYPOINT_ON else None

    gen = make_anchor_generator(cfg)
    rpn = cfg.MODEL.RPN
    roi = cfg.MODEL.ROI_HEADS
    rpn_head_module = None
    if rpn.RPN_HEAD == "FBNet.rpn_head":
        from .backbone.fbnet import make_fbnet_rpn_head
        rpn_head_module = make_fbnet_rpn_head(
            cfg, gen.num_anchors_per_location, dtype)
    elif rpn.RPN_HEAD != "SingleConvRPNHead":
        raise KeyError(f"unknown RPN_HEAD: {rpn.RPN_HEAD}")
    model = GeneralizedRCNN(
        backbone=backbone,
        feature_extractor=extractor,
        predictor=predictor,
        da_heads=da,
        mask_head=mask,
        keypoint_head=kp,
        rpn_only=cfg.MODEL.RPN_ONLY,
        num_anchors=gen.num_anchors_per_location,
        anchor_sizes=tuple(rpn.ANCHOR_SIZES),
        aspect_ratios=tuple(rpn.ASPECT_RATIOS),
        anchor_strides=tuple(rpn.ANCHOR_STRIDE),
        straddle_thresh=rpn.STRADDLE_THRESH,
        rpn_train=rpn_config(cfg, True),
        rpn_test=rpn_config(cfg, False),
        rpn_loss_cfg=dict(
            fg_iou=rpn.FG_IOU_THRESHOLD, bg_iou=rpn.BG_IOU_THRESHOLD,
            batch_per_image=rpn.BATCH_SIZE_PER_IMAGE,
            positive_fraction=rpn.POSITIVE_FRACTION,
            straddle_thresh=rpn.STRADDLE_THRESH,
            approx_topk=cfg.TPU.APPROX_TOPK),
        sample_cfg=dict(
            fg_iou=roi.FG_IOU_THRESHOLD, bg_iou=roi.BG_IOU_THRESHOLD,
            batch_per_image=roi.BATCH_SIZE_PER_IMAGE,
            positive_fraction=roi.POSITIVE_FRACTION,
            reg_weights=tuple(roi.BBOX_REG_WEIGHTS),
            approx_topk=cfg.TPU.APPROX_TOPK),
        post_cfg=dict(
            score_thresh=roi.SCORE_THRESH, nms_thresh=roi.NMS,
            detections_per_img=roi.DETECTIONS_PER_IMG,
            reg_weights=tuple(roi.BBOX_REG_WEIGHTS),
            cls_agnostic=cfg.MODEL.CLS_AGNOSTIC_BBOX_REG),
        rpn_head_module=rpn_head_module,
        share_positive_pool=cfg.TPU.SHARE_POSITIVE_POOL,
        dtype=dtype,
        pixel_mean=tuple(cfg.INPUT.PIXEL_MEAN),
        pixel_std=tuple(cfg.INPUT.PIXEL_STD),
        to_bgr255=cfg.INPUT.TO_BGR255,
    )
    return model
