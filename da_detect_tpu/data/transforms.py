"""Host-side preprocessing (reference data/transforms/transforms.py:17-98).

Caffe2 convention preserved exactly: BGR channel order, 0-255 range, mean
subtraction only (PIXEL_STD = 1). Resize keeps the reference's
min-side/max-side logic; the result lands on a fixed padded canvas
(SIZE_DIVISIBILITY-rounded) so every batch has a static shape (SURVEY §5.7).

Random parameters (min-size choice, flip) are *explicit arguments* so the
triplet loader can apply identical geometry to all three aligned domains —
the reference transforms each dataset independently, which mis-aligns
targets whenever flips disagree (data/build.py:23-62); we fix that.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def compute_resize_hw(height: int, width: int, min_size: int,
                      max_size: int | None):
    """Reference Resize.get_size (transforms.py:35-60): scale so the short
    side hits ``min_size`` unless the long side would exceed ``max_size``."""
    w, h = width, height
    size = min_size
    if max_size is not None:
        min_o, max_o = min(w, h), max(w, h)
        if max_o / min_o * size > max_size:
            size = int(round(max_size * min_o / max_o))
    if (w <= h and w == size) or (h <= w and h == size):
        return h, w
    if w < h:
        ow = size
        oh = int(size * h / w)
    else:
        oh = size
        ow = int(size * w / h)
    return oh, ow


def load_image_bgr(path: str) -> np.ndarray:
    """uint8 BGR HWC (cv2 native order == the Caffe2 convention)."""
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return img


def transform_boxes(boxes: np.ndarray, h: int, w: int, oh: int, ow: int,
                    hflip: bool) -> np.ndarray:
    """Box-only counterpart of apply_geometry (shared with the fused native
    image path)."""
    if len(boxes):
        boxes = boxes * np.array([ow / w, oh / h, ow / w, oh / h], np.float32)
        if hflip:
            x1 = ow - 1 - boxes[:, 2]
            x2 = ow - 1 - boxes[:, 0]
            boxes = np.stack([x1, boxes[:, 1], x2, boxes[:, 3]], 1)
    return boxes.astype(np.float32)


def apply_geometry(image: np.ndarray, boxes: np.ndarray, *, min_size: int,
                   max_size: int | None, hflip: bool):
    """Resize + optional horizontal flip. Returns (image, boxes, (rh, rw))."""
    h, w = image.shape[:2]
    oh, ow = compute_resize_hw(h, w, min_size, max_size)
    if (oh, ow) != (h, w):
        image = cv2.resize(image, (ow, oh), interpolation=cv2.INTER_LINEAR)
    if len(boxes):
        boxes = boxes * np.array([ow / w, oh / h, ow / w, oh / h], np.float32)
    if hflip:
        image = image[:, ::-1]
        if len(boxes):
            x1 = ow - 1 - boxes[:, 2]
            x2 = ow - 1 - boxes[:, 0]
            boxes = np.stack([x1, boxes[:, 1], x2, boxes[:, 3]], 1)
    return np.ascontiguousarray(image), boxes.astype(np.float32), (oh, ow)


def normalize_and_pad(image: np.ndarray, canvas_hw, pixel_mean,
                      to_bgr255: bool = True, pixel_std=(1.0, 1.0, 1.0)):
    """-> float32 [H, W, 3] on the padded canvas (zeros outside)."""
    ch, cw = canvas_hw
    h, w = image.shape[:2]
    out = np.zeros((ch, cw, 3), np.float32)
    img = image.astype(np.float32)
    if not to_bgr255:
        # torch convention: RGB 0-1 (cv2 loads BGR -> reverse channels)
        img = img[..., ::-1] / 255.0
    img = (img - np.asarray(pixel_mean, np.float32)) / np.asarray(
        pixel_std, np.float32)
    out[:h, :w] = img
    return out


def resize_flip_pad_u8(image: np.ndarray, canvas_hw, rh: int, rw: int,
                       hflip: bool) -> np.ndarray:
    """uint8 transport path (``TPU.TRANSPORT_PIXELS: uint8``): resize +
    flip + pad the RAW pixels; normalization happens ON DEVICE
    (ImageBatch.normalized) where it fuses into the first conv — the wire
    then carries 1 byte/pixel instead of 4 (the host->device link is the
    system bottleneck on relayed attachments, PERFORMANCE.md §Host input
    pipeline). cv2's uint8 bilinear rounds to 1/255 — below the bf16
    compute rounding at pixel magnitudes (eps ~1.0 at 128)."""
    h, w = image.shape[:2]
    if (rh, rw) != (h, w):
        image = cv2.resize(image, (rw, rh), interpolation=cv2.INTER_LINEAR)
    if hflip:
        image = image[:, ::-1]
    ch, cw = canvas_hw
    out = np.zeros((ch, cw, 3), np.uint8)
    out[:rh, :rw] = image
    return out


def canvas_for(cfg, is_train: bool):
    """Static canvas (H, W) from config; TPU.IMAGE_SHAPE overrides."""
    th, tw = cfg.TPU.IMAGE_SHAPE
    if th and tw:
        return int(th), int(tw)
    div = max(cfg.DATALOADER.SIZE_DIVISIBILITY, 1)
    mins = cfg.INPUT.MIN_SIZE_TRAIN if is_train else (cfg.INPUT.MIN_SIZE_TEST,)
    max_side = cfg.INPUT.MAX_SIZE_TRAIN if is_train else cfg.INPUT.MAX_SIZE_TEST

    def up(x):
        return int(-(-x // div) * div)

    return up(max(mins)), up(max_side)


def rasterize_polygons(segmentations, box, resolution: int) -> np.ndarray:
    """COCO polygon(s) -> binary mask in the box's own frame
    [resolution, resolution] (the fixed-shape replacement for the reference's
    SegmentationMask cropping)."""
    mask = np.zeros((resolution, resolution), np.uint8)
    if not segmentations or cv2 is None:
        return mask.astype(np.float32)
    x1, y1, x2, y2 = box
    w = max(x2 - x1, 1e-3)
    h = max(y2 - y1, 1e-3)
    polys = []
    for seg in segmentations:
        p = np.asarray(seg, np.float64).reshape(-1, 2)
        p[:, 0] = (p[:, 0] - x1) / w * resolution
        p[:, 1] = (p[:, 1] - y1) / h * resolution
        polys.append(np.round(p).astype(np.int32))
    cv2.fillPoly(mask, polys, 1)
    return mask.astype(np.float32)
