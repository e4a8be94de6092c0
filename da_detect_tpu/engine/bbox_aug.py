"""Test-time augmentation (multi-scale + horizontal flip).

The reference ships this (engine/bbox_aug.py:11-118) but leaves it
unreachable — the TEST.BBOX_AUG keys are missing from its defaults and
inference never calls it (SURVEY §2.7). Here it is wired: enable with
TEST.BBOX_AUG.ENABLED. Each augmentation (native scale, extra SCALES, and
H_FLIP variants) runs through the fixed-shape eval forward with its own
canvas (one XLA program per scale); per-image detections are merged in
original-image coordinates and reduced with a final per-class NMS.
"""

from __future__ import annotations

import logging

import numpy as np

log = logging.getLogger(__name__)


def _np_per_class_nms(boxes, scores, labels, thresh, max_dets):
    try:
        from ..native import nms_per_class
        keep_mask = nms_per_class(boxes.astype(np.float32),
                                  scores.astype(np.float32),
                                  labels.astype(np.int32), thresh)
        kept = np.flatnonzero(keep_mask)
        return kept[np.argsort(-scores[kept], kind="stable")][:max_dets]
    except Exception:
        pass  # fall back to pure python below
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        if len(keep) >= max_dets * 4:
            break
        bi = boxes[i]
        ai = (bi[2] - bi[0] + 1) * (bi[3] - bi[1] + 1)
        same = labels == labels[i]
        cand = np.flatnonzero(same & ~suppressed)
        bx = boxes[cand]
        iw = np.minimum(bx[:, 2], bi[2]) - np.maximum(bx[:, 0], bi[0]) + 1
        ih = np.minimum(bx[:, 3], bi[3]) - np.maximum(bx[:, 1], bi[1]) + 1
        inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
        areas = (bx[:, 2] - bx[:, 0] + 1) * (bx[:, 3] - bx[:, 1] + 1)
        iou = inter / np.maximum(ai + areas - inter, 1e-10)
        suppressed[cand[(iou > thresh) & (cand != i)]] = True
    keep = np.asarray(keep[:max_dets], np.int64)
    return keep


def compute_on_dataset_aug(model, variables, cfg, dataset_name: str,
                           sharding=None):
    """Multi-pass eval; returns merged predictions {image_id: ...}."""
    from ..config import CfgNode
    from ..data import make_data_loader
    from .inference import compute_on_dataset

    aug = cfg.TEST.BBOX_AUG
    passes = [(cfg.INPUT.MIN_SIZE_TEST, cfg.INPUT.MAX_SIZE_TEST, False)]
    if aug.H_FLIP:
        passes.append((cfg.INPUT.MIN_SIZE_TEST, cfg.INPUT.MAX_SIZE_TEST, True))
    for s in aug.SCALES:
        passes.append((s, aug.MAX_SIZE, False))
        if aug.SCALE_H_FLIP:
            passes.append((s, aug.MAX_SIZE, True))

    merged: dict = {}
    for min_size, max_size, hflip in passes:
        c = cfg.clone()
        c.defrost()
        c.INPUT.MIN_SIZE_TEST = min_size
        c.INPUT.MAX_SIZE_TEST = max_size
        c.TPU.IMAGE_SHAPE = (0, 0)  # re-derive canvas per scale
        loader, dataset = make_data_loader(
            c, is_train=False, dataset_names=(dataset_name,),
            sharding=sharding, hflip=hflip)
        log.info("TTA pass: min_size=%s max_size=%s hflip=%s",
                 min_size, max_size, hflip)
        preds = compute_on_dataset(model, variables, loader, progress_every=0)
        widths = {im["id"]: im["width"] for im in dataset.images}
        for img_id, p in preds.items():
            boxes = np.asarray(p["boxes"], np.float32)
            if hflip and len(boxes):
                w0 = widths[img_id]
                x1 = w0 - 1 - boxes[:, 2]
                x2 = w0 - 1 - boxes[:, 0]
                boxes = np.stack([x1, boxes[:, 1], x2, boxes[:, 3]], 1)
            if img_id not in merged:
                merged[img_id] = dict(boxes=[], scores=[], labels=[])
            merged[img_id]["boxes"].append(boxes)
            merged[img_id]["scores"].append(np.asarray(p["scores"]))
            merged[img_id]["labels"].append(np.asarray(p["labels"]))

    out = {}
    thresh = cfg.MODEL.ROI_HEADS.NMS
    max_dets = cfg.TEST.DETECTIONS_PER_IMG
    for img_id, p in merged.items():
        boxes = np.concatenate(p["boxes"]) if p["boxes"] else np.zeros((0, 4))
        scores = np.concatenate(p["scores"]) if p["scores"] else np.zeros((0,))
        labels = np.concatenate(p["labels"]) if p["labels"] else np.zeros((0,))
        keep = _np_per_class_nms(boxes, scores, labels, thresh, max_dets)
        out[img_id] = dict(boxes=boxes[keep], scores=scores[keep],
                           labels=labels[keep])
    return out, dataset
