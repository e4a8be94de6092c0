"""VGG-16 backbone (stride-16 conv5_3 trunk).

The original DA-Faster-RCNN used VGG-16; the reference's DA heads still
special-case ``CONV_BODY.startswith('V')`` (da_heads.py:86 picks
MLP_HEAD_DIM instance features) but its backbone registry never provides a
VGG body. Here it exists: conv1_1..conv5_3 with the final pool dropped,
single stride-16 output — pair with FEATURE_EXTRACTOR=FPN2MLPFeatureExtractor
(POOLER_SCALES (0.0625,), RESOLUTION 7) for the classic fc6/fc7 head.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

# channels per conv block (VGG-16 "D" configuration)
_BLOCKS = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class VGG16(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for bi, (ch, n) in enumerate(_BLOCKS):
            for ci in range(n):
                x = nn.relu(nn.Conv(ch, (3, 3), padding="SAME",
                                    dtype=self.dtype,
                                    name=f"conv{bi + 1}_{ci + 1}")(x))
            if bi < len(_BLOCKS) - 1:  # no pool after conv5_3 -> stride 16
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return [x]


def build_vgg_backbone(cfg):
    from .backbone import BackboneSpec

    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    return VGG16(dtype=dtype), BackboneSpec(out_channels=512, strides=(16,))
