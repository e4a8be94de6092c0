"""Single-image serving (reference demo/predictor.py COCODemo:14-447).

``run_on_opencv_image(img_bgr)`` -> annotated image; ``compute_prediction``
-> raw detections in original coordinates. The eval forward is jitted once
per canvas (fixed shapes), so repeated calls are cheap.
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


class COCODemo:
    def __init__(self, cfg, confidence_threshold: float = 0.7,
                 weight: str | None = None, categories=None):
        self.cfg = cfg
        self.confidence_threshold = confidence_threshold
        self.categories = categories or CITYSCAPES_CATEGORIES
        self.model = build_detection_model(cfg)
        self.canvas = canvas_for(cfg, is_train=False)
        dummy = ImageBatch(
            images=jnp.zeros((1, *self.canvas, 3), jnp.float32),
            sizes=jnp.asarray([[self.canvas[0], self.canvas[1]]], jnp.int32),
            orig_sizes=jnp.asarray([[self.canvas[0], self.canvas[1]]], jnp.int32),
            is_source=jnp.ones((1,), bool))
        self.variables = self.model.init({"params": jax.random.PRNGKey(0)}, dummy)
        weight = weight or cfg.MODEL.WEIGHT
        if weight:
            self.variables = Checkpointer.load_weight_file(
                weight, dict(self.variables),
                pool_resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION)
        self._forward = jax.jit(lambda v, b: self.model.apply(v, b))

    def compute_prediction(self, original_bgr: np.ndarray):
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
        dets = jax.device_get(self._forward(self.variables, batch))
        keep = dets.valid[0] & (dets.scores[0] >= self.confidence_threshold)
        boxes = dets.boxes[0][keep] * np.array(
            [w0 / rw, h0 / rh, w0 / rw, h0 / rh], np.float32)
        return boxes, dets.scores[0][keep], dets.labels[0][keep]

    def run_on_opencv_image(self, original_bgr: np.ndarray) -> np.ndarray:
        boxes, scores, labels = self.compute_prediction(original_bgr)
        out = original_bgr.copy()
        for box, score, label in zip(boxes, scores, labels):
            x1, y1, x2, y2 = (int(v) for v in box)
            cv2.rectangle(out, (x1, y1), (x2, y2), (0, 220, 0), 2)
            name = (self.categories[label] if label < len(self.categories)
                    else str(int(label)))
            cv2.putText(out, f"{name}: {score:.2f}", (x1, max(y1 - 4, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 220, 0), 1)
        return out
