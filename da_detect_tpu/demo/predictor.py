"""Single-image serving (reference demo/predictor.py COCODemo:14-447).

``run_on_opencv_image(img_bgr)`` -> annotated image; ``compute_prediction``
-> raw detections in original coordinates. The eval forward is jitted once
per canvas (fixed shapes), so repeated calls are cheap.

Overlay capability parity with the reference demo (:173-387): per-class
colored boxes, mask contours (MASK_ON), mask-probability heatmap montage
(``show_mask_heatmaps``), keypoint skeletons (KEYPOINT_ON), class-name
labels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..data.transforms import (apply_geometry, canvas_for, normalize_and_pad)
from ..models import build_detection_model
from ..structures.image_batch import ImageBatch
from ..utils.checkpoint import Checkpointer

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

CITYSCAPES_CATEGORIES = ["__background__", "person", "rider", "car", "truck",
                         "bus", "train", "motorcycle", "bicycle"]

# COCO person-17 skeleton (reference structures/keypoint.py kp_connections)
PERSON_KP_CONNECTIONS = [
    (1, 2), (1, 0), (2, 0), (2, 4), (1, 3), (6, 8), (8, 10), (5, 7), (7, 9),
    (12, 14), (14, 16), (11, 13), (13, 15), (6, 5), (12, 11),
]


class COCODemo:
    def __init__(self, cfg, confidence_threshold: float = 0.7,
                 weight: str | None = None, categories=None,
                 show_mask_heatmaps: bool = False, masks_per_dim: int = 2):
        self.cfg = cfg
        self.confidence_threshold = confidence_threshold
        self.categories = categories or CITYSCAPES_CATEGORIES
        self.show_mask_heatmaps = show_mask_heatmaps
        self.masks_per_dim = masks_per_dim
        self.with_masks = bool(cfg.MODEL.MASK_ON)
        self.with_keypoints = bool(cfg.MODEL.KEYPOINT_ON)
        self.model = build_detection_model(cfg)
        self.canvas = canvas_for(cfg, is_train=False)
        dummy = ImageBatch(
            images=jnp.zeros((1, *self.canvas, 3), jnp.float32),
            sizes=jnp.asarray([[self.canvas[0], self.canvas[1]]], jnp.int32),
            orig_sizes=jnp.asarray([[self.canvas[0], self.canvas[1]]], jnp.int32),
            is_source=jnp.ones((1,), bool))
        init_kwargs = ({"with_masks": True} if self.with_masks else
                       {"with_keypoints": True} if self.with_keypoints else {})
        self.variables = self.model.init({"params": jax.random.PRNGKey(0)},
                                         dummy, **init_kwargs)
        weight = weight or cfg.MODEL.WEIGHT
        if weight:
            self.variables = Checkpointer.load_weight_file(
                weight, dict(self.variables),
                pool_resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION)
        if self.with_masks:
            self._forward = jax.jit(
                lambda v, b: self.model.apply(v, b, with_masks=True))
        elif self.with_keypoints:
            self._forward = jax.jit(
                lambda v, b: self.model.apply(v, b, with_keypoints=True))
        else:
            self._forward = jax.jit(lambda v, b: self.model.apply(v, b))

    def compute_prediction(self, original_bgr: np.ndarray):
        """Returns (boxes, scores, labels[, masks | keypoints]) in original
        image coordinates; masks are full-frame bool [D, H, W] (the
        reference pastes via its Masker at this point too)."""
        h0, w0 = original_bgr.shape[:2]
        img, _, (rh, rw) = apply_geometry(
            original_bgr, np.zeros((0, 4), np.float32),
            min_size=self.cfg.INPUT.MIN_SIZE_TEST,
            max_size=self.cfg.INPUT.MAX_SIZE_TEST, hflip=False)
        canvas = self.canvas if rh <= rw else (self.canvas[1], self.canvas[0])
        padded = normalize_and_pad(img, canvas, self.cfg.INPUT.PIXEL_MEAN,
                                   self.cfg.INPUT.TO_BGR255,
                                   self.cfg.INPUT.PIXEL_STD)
        batch = ImageBatch(
            images=jnp.asarray(padded[None]),
            sizes=jnp.asarray([[rh, rw]], jnp.int32),
            orig_sizes=jnp.asarray([[h0, w0]], jnp.int32),
            is_source=jnp.ones((1,), bool))
        out = jax.device_get(self._forward(self.variables, batch))
        # Detections is itself a pytree tuple — unpack by mode, not by type
        if self.with_masks or self.with_keypoints:
            dets, extra = out
        else:
            dets, extra = out, None
        keep = dets.valid[0] & (dets.scores[0] >= self.confidence_threshold)
        scale = np.array([w0 / rw, h0 / rh, w0 / rw, h0 / rh], np.float32)
        boxes = dets.boxes[0][keep] * scale
        scores, labels = dets.scores[0][keep], dets.labels[0][keep]
        if self.with_masks and extra is not None:
            from ..data.masker import paste_masks
            masks = paste_masks(np.asarray(extra[0][keep]), boxes, (h0, w0))
            return boxes, scores, labels, masks, np.asarray(extra[0][keep])
        if self.with_keypoints and extra is not None:
            kps = np.asarray(extra[0][keep], np.float32)
            kps[..., 0] *= w0 / rw
            kps[..., 1] *= h0 / rh
            return boxes, scores, labels, kps
        return boxes, scores, labels

    # -- overlays (reference demo/predictor.py:264-387) ---------------------

    def compute_colors_for_labels(self, labels: np.ndarray) -> list:
        """Fixed per-class colors (reference palette trick)."""
        palette = np.array([2 ** 25 - 1, 2 ** 15 - 1, 2 ** 21 - 1],
                           np.int64)
        return (np.asarray(labels, np.int64)[:, None] * palette % 255).astype(
            np.uint8).tolist()

    def overlay_boxes(self, image, boxes, labels):
        for box, color in zip(boxes, self.compute_colors_for_labels(labels)):
            x1, y1, x2, y2 = (int(v) for v in box)
            cv2.rectangle(image, (x1, y1), (x2, y2),
                          tuple(int(c) for c in color), 2)
        return image

    def overlay_mask(self, image, masks, labels):
        """Instance contours, one color per class (reference :287-311)."""
        for mask, color in zip(masks, self.compute_colors_for_labels(labels)):
            contours, _ = cv2.findContours(mask.astype(np.uint8),
                                           cv2.RETR_TREE,
                                           cv2.CHAIN_APPROX_SIMPLE)
            cv2.drawContours(image, contours, -1,
                             tuple(int(c) for c in color), 3)
        return image

    def create_mask_montage(self, mask_probs):
        """Probability-heatmap grid, JET colormap (reference :322-357)."""
        d = self.masks_per_dim
        if len(mask_probs) == 0:
            hm, wm = 14, 14
            probs = np.zeros((d * d, hm, wm), np.float32)
        else:
            hm, wm = mask_probs.shape[-2:]
            probs = np.zeros((d * d, hm, wm), np.float32)
            probs[:min(len(mask_probs), d * d)] = \
                mask_probs[:d * d].reshape(-1, hm, wm)
        rows = [np.concatenate(list(probs[y * d:(y + 1) * d]), axis=1)
                for y in range(d)]
        montage = (np.concatenate(rows, axis=0) * 255).astype(np.uint8)
        return cv2.applyColorMap(montage, cv2.COLORMAP_JET)

    def overlay_keypoints(self, image, keypoints, kp_thresh: float = 0.0,
                          alpha: float = 0.7):
        """Skeleton lines + joints per person, rainbow colors, alpha-blended
        (reference vis_keypoints, demo/predictor.py:389-447; the
        mid-shoulder->nose and mid-shoulder->mid-hip virtual bones
        included)."""
        n_lines = len(PERSON_KP_CONNECTIONS)
        grad = np.linspace(0, 255, n_lines + 2).astype(np.uint8)[None]
        colors = [tuple(int(v) for v in c)
                  for c in cv2.applyColorMap(grad, cv2.COLORMAP_RAINBOW)[0]]
        canvas = image.copy()
        for kp in keypoints:
            if kp.shape[0] >= 17:  # person-17 virtual bones
                mid_sh = (kp[5, :2] + kp[6, :2]) / 2
                sc_sh = min(kp[5, 2], kp[6, 2])
                mid_hip = (kp[11, :2] + kp[12, :2]) / 2
                sc_hip = min(kp[11, 2], kp[12, 2])
                if sc_sh > kp_thresh and kp[0, 2] > kp_thresh:
                    cv2.line(canvas, tuple(mid_sh.astype(int)),
                             tuple(kp[0, :2].astype(int)),
                             colors[n_lines], 2, cv2.LINE_AA)
                if sc_sh > kp_thresh and sc_hip > kp_thresh:
                    cv2.line(canvas, tuple(mid_sh.astype(int)),
                             tuple(mid_hip.astype(int)),
                             colors[n_lines + 1], 2, cv2.LINE_AA)
            for li, (i1, i2) in enumerate(PERSON_KP_CONNECTIONS):
                if i1 >= kp.shape[0] or i2 >= kp.shape[0]:
                    continue
                p1 = tuple(kp[i1, :2].astype(int))
                p2 = tuple(kp[i2, :2].astype(int))
                if kp[i1, 2] > kp_thresh and kp[i2, 2] > kp_thresh:
                    cv2.line(canvas, p1, p2, colors[li], 2, cv2.LINE_AA)
                if kp[i1, 2] > kp_thresh:
                    cv2.circle(canvas, p1, 3, colors[li], -1, cv2.LINE_AA)
                if kp[i2, 2] > kp_thresh:
                    cv2.circle(canvas, p2, 3, colors[li], -1, cv2.LINE_AA)
        return cv2.addWeighted(image, 1.0 - alpha, canvas, alpha, 0)

    def overlay_class_names(self, image, boxes, scores, labels):
        for box, score, label in zip(boxes, scores, labels):
            x1, y1 = int(box[0]), int(box[1])
            name = (self.categories[label] if label < len(self.categories)
                    else str(int(label)))
            cv2.putText(image, f"{name}: {score:.2f}", (x1, max(y1 - 4, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 0, 0), 1)
        return image

    def run_on_opencv_image(self, original_bgr: np.ndarray) -> np.ndarray:
        pred = self.compute_prediction(original_bgr)
        boxes, scores, labels = pred[0], pred[1], pred[2]
        if self.with_masks and self.show_mask_heatmaps:
            return self.create_mask_montage(pred[4])
        out = original_bgr.copy()
        out = self.overlay_boxes(out, boxes, labels)
        if self.with_masks:
            out = self.overlay_mask(out, pred[3], labels)
        if self.with_keypoints:
            out = self.overlay_keypoints(out, pred[3])
        out = self.overlay_class_names(out, boxes, scores, labels)
        return out
