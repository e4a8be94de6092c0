"""FBNet mobile search-space backbones (reference modeling/backbone/fbnet*.py,
~1.3k LoC upstream feature, unused by any DA config — SURVEY §2.5).

Implemented as a compact inverted-residual (MBConv) builder covering the
architecture definitions the reference configs actually reference
("default", "mnv2", "chamv1a", "xirb16d_dsmask" fall back to "default"
block tables trimmed to what e2e_*_fbnet*.yaml exercise).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn


class MBConv(nn.Module):
    features: int
    expansion: int = 6
    stride: int = 1
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x.shape[-1]
        mid = inp * self.expansion
        h = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype, name="pw")(x)
        h = nn.relu(nn.BatchNorm(use_running_average=True, name="pw_bn")(h))
        h = nn.Conv(mid, (self.kernel,) * 2, strides=(self.stride,) * 2,
                    padding="SAME", feature_group_count=mid, use_bias=False,
                    dtype=self.dtype, name="dw")(h)
        h = nn.relu(nn.BatchNorm(use_running_average=True, name="dw_bn")(h))
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pwl")(h)
        h = nn.BatchNorm(use_running_average=True, name="pwl_bn")(h)
        if self.stride == 1 and inp == self.features:
            h = h + x
        return h


# (features, expansion, stride, kernel) per block; stride-16 trunk
_DEFAULT_ARCH: Sequence[tuple[int, int, int, int]] = (
    (16, 1, 1, 3),
    (24, 6, 2, 3), (24, 6, 1, 3),
    (32, 6, 2, 5), (32, 6, 1, 5),
    (64, 6, 2, 5), (64, 6, 1, 5), (96, 6, 1, 3),
)


class FBNetTrunk(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(16, (3, 3), strides=(2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="first")(x.astype(self.dtype))
        x = nn.relu(nn.BatchNorm(use_running_average=True, name="first_bn")(x))
        for i, (f, e, s, k) in enumerate(_DEFAULT_ARCH):
            x = MBConv(f, e, s, k, dtype=self.dtype, name=f"block{i}")(x)
        return [x]


def build_fbnet_backbone(cfg):
    from .backbone import BackboneSpec
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    return FBNetTrunk(dtype=dtype), BackboneSpec(out_channels=96, strides=(16,))
