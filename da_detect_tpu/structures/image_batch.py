"""Static-shape image batch + padded targets.

Replaces the reference's ``ImageList`` (pad-to-max dynamic batching,
maskrcnn_benchmark/structures/image_list.py:15-91) with a *fixed* padded
canvas: every batch is ``[B, H, W, 3]`` (NHWC — the TPU-friendly conv layout)
at a statically configured bucket shape, with per-image valid sizes carried
alongside. The reference's ``ImageList.__add__`` source/target concatenation
becomes a plain leading-axis concat with an ``is_source`` flag vector; the DA
batch layout convention is **sources first** (made explicit here where the
reference leaves it implicit — SURVEY §7.3).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ImageBatch:
    # [B, H, W, 3]: float (already normalized on host, Caffe2 BGR-255
    # convention) OR uint8 raw pixels (TPU.TRANSPORT_PIXELS: the loaders
    # ship 1 byte/pixel and `normalized()` runs on device, where the affine
    # fuses into the first conv)
    images: jnp.ndarray
    sizes: jnp.ndarray       # [B, 2] int32 (valid h, w) within the padded canvas
    orig_sizes: jnp.ndarray  # [B, 2] int32 original (pre-resize) image h, w
    is_source: jnp.ndarray   # [B] bool — domain flag per image

    def normalized(self, pixel_mean, pixel_std=(1.0, 1.0, 1.0),
                   to_bgr255: bool = True) -> jnp.ndarray:
        """float32 normalized canvas. uint8 transport: the device-side
        replica of transforms.normalize_and_pad — same affine in f32, and
        the canvas padding is forced to exact 0.0 (the host f32 path pads
        AFTER normalizing, so padding is 0.0 in normalized space, not
        -mean). Float images pass through (already normalized on host:
        loaders in float32 mode, demo/predictor, synthetic benches)."""
        imgs = self.images
        if imgs.dtype != jnp.uint8:
            return imgs
        x = imgs.astype(jnp.float32)
        if not to_bgr255:
            x = x[..., ::-1] / 255.0  # torch convention: RGB 0-1
        x = (x - jnp.asarray(pixel_mean, jnp.float32)) \
            / jnp.asarray(pixel_std, jnp.float32)
        h, w = imgs.shape[1], imgs.shape[2]
        yy = jnp.arange(h)[None, :, None]
        xx = jnp.arange(w)[None, None, :]
        mask = ((yy < self.sizes[:, 0, None, None])
                & (xx < self.sizes[:, 1, None, None]))
        return x * mask[..., None]

    @property
    def batch_size(self) -> int:
        return self.images.shape[0]

    @property
    def canvas_hw(self) -> tuple[int, int]:
        return self.images.shape[1], self.images.shape[2]

    def concat(self, *others: "ImageBatch") -> "ImageBatch":
        """Leading-axis concat (replaces ImageList.__add__; source batch must
        come first — RPN loss relies on source-first ordering)."""
        batches = (self, *others)
        return ImageBatch(
            images=jnp.concatenate([b.images for b in batches], axis=0),
            sizes=jnp.concatenate([b.sizes for b in batches], axis=0),
            orig_sizes=jnp.concatenate([b.orig_sizes for b in batches], axis=0),
            is_source=jnp.concatenate([b.is_source for b in batches], axis=0),
        )


@struct.dataclass
class Targets:
    """Padded ground-truth boxes per image (capacity G = TPU.MAX_GT_BOXES).

    ``masks`` (optional, MASK_ON only): per-instance binary masks rasterized
    into each GT box's own frame at a fixed resolution [B, G, M, M] — the
    fixed-shape replacement for the reference's lazy polygon cropping
    (structures/segmentation_mask.py); training projects them into proposal
    frames with a bilinear affine resample (models/mask_head.py).
    """

    boxes: jnp.ndarray   # [B, G, 4] float32 xyxy in the resized/padded frame
    labels: jnp.ndarray  # [B, G] int32 (1..C-1; 0 reserved for background)
    valid: jnp.ndarray   # [B, G] bool
    masks: jnp.ndarray | None = None  # [B, G, M, M] float32 in gt-box frame
    keypoints: jnp.ndarray | None = None  # [B, G, K, 3] (x, y, visibility)

    @property
    def capacity(self) -> int:
        return self.boxes.shape[-2]

    def concat(self, *others: "Targets") -> "Targets":
        ts = (self, *others)

        def opt(field):
            vals = [getattr(t, field) for t in ts]
            if any(v is None for v in vals):
                return None
            return jnp.concatenate(vals, axis=0)

        return Targets(
            boxes=jnp.concatenate([t.boxes for t in ts], axis=0),
            labels=jnp.concatenate([t.labels for t in ts], axis=0),
            valid=jnp.concatenate([t.valid for t in ts], axis=0),
            masks=opt("masks"),
            keypoints=opt("keypoints"),
        )
