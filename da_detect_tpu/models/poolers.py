"""Multi-level ROI pooling (reference modeling/poolers.py:11-121).

The reference gathers each ROI's assigned FPN level then calls the CUDA
ROIAlign per level on its subset. Fixed-shape TPU version: pool every ROI
from every level (the einsum ROIAlign is cheap enough that the extra levels
cost < 2x the finest level alone) and select the assigned level's result with
a one-hot mask — no data-dependent gathers, fully batched.

Level assignment is Eqn. 1 of the FPN paper (LevelMapper, poolers.py:11-43):
k = floor(k0 + log2(sqrt(area) / 224)), clamped to the available levels.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp

from ..ops import box_ops
from ..ops.roi_align import roi_align


def assign_levels(rois: jnp.ndarray, k_min: int, k_max: int,
                  canonical_scale: int = 224, canonical_level: int = 4,
                  eps: float = 1e-6) -> jnp.ndarray:
    """rois [..., 4] -> level index in [0, k_max - k_min]."""
    area = box_ops.box_area(rois, legacy_plus1=True)
    s = jnp.sqrt(jnp.maximum(area, 0.0))
    lvl = jnp.floor(canonical_level + jnp.log2(s / canonical_scale + eps))
    lvl = jnp.clip(lvl, k_min, k_max)
    return (lvl - k_min).astype(jnp.int32)


def pool_rois(features: Sequence[jnp.ndarray], rois: jnp.ndarray, *,
              scales: Sequence[float], output_size: int, sampling_ratio: int,
              max_samples: int = 8, use_pallas: bool = False) -> jnp.ndarray:
    """features: per-level [B, H_l, W_l, C]; rois [B, R, 4] (image coords).
    Returns [B, R, P, P, C]."""
    if len(features) == 1:
        return roi_align(features[0], rois, spatial_scale=scales[0],
                         output_size=output_size, sampling_ratio=sampling_ratio,
                         max_samples=max_samples, use_pallas=use_pallas)
    k_min = -int(math.log2(scales[0]))
    k_max = -int(math.log2(scales[-1]))
    levels = assign_levels(rois, k_min, k_max)            # [B, R]
    out = None
    for i, (feat, scale) in enumerate(zip(features, scales)):
        pooled = roi_align(feat, rois, spatial_scale=scale,
                           output_size=output_size, sampling_ratio=sampling_ratio,
                           max_samples=max_samples, use_pallas=use_pallas)
        sel = (levels == i).astype(pooled.dtype)[..., None, None, None]
        out = pooled * sel if out is None else out + pooled * sel
    return out


def pooler_config(cfg, head: str = "ROI_BOX_HEAD") -> dict:
    """Single source of the pooler kwargs for every ROI head (box, mask,
    keypoint, fbnet). use_pallas stays False for pooling: the VMEM-resident
    kernel measured slower than the layout-tuned einsum path (P=14 starves
    the MXU per block; see ops/roi_align_pallas.py docstring)."""
    h = cfg.MODEL[head]
    return dict(scales=tuple(h.POOLER_SCALES), output_size=h.POOLER_RESOLUTION,
                sampling_ratio=h.POOLER_SAMPLING_RATIO,
                max_samples=cfg.TPU.ROI_MAX_SAMPLES)
