"""Feature Pyramid Network (reference modeling/backbone/fpn.py:7-99).

Lateral 1x1 + nearest-2x top-down + 3x3 output convs; LastLevelMaxPool P6
for two-stage FPN, LastLevelP6P7 for RetinaNet. Kaiming-uniform(a=1) init
like the reference's conv_with_kaiming_uniform (make_layers.py:89-122).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

_kaiming_uniform_a1 = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")


def _upsample_nearest_2x(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample to an exact target H, W (handles odd
    sizes the way F.interpolate(scale_factor=2) + crop would)."""
    b, h, w, c = x.shape
    th, tw = out_hw
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return up[:, :th, :tw, :]


class FPN(nn.Module):
    out_channels: int = 256
    use_relu: bool = False
    norm: str = "none"  # "gn" for the gn_baselines configs
    top_block: str = "maxpool"  # "maxpool" | "p6p7" | "none"
    p6p7_in_from_c5: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: list[jnp.ndarray]) -> list[jnp.ndarray]:
        from ...layers import make_norm

        n = len(features)
        inner = []
        for i, f in enumerate(features):
            x = nn.Conv(self.out_channels, (1, 1), use_bias=(self.norm == "none"),
                        kernel_init=_kaiming_uniform_a1, dtype=self.dtype,
                        name=f"fpn_inner{i + 1}")(f.astype(self.dtype))
            if self.norm != "none":
                x = make_norm(self.norm, name=f"fpn_inner{i + 1}_norm")(x)
            if self.use_relu:
                x = nn.relu(x)
            inner.append(x)

        merged = [inner[-1]]
        for i in range(n - 2, -1, -1):
            td = _upsample_nearest_2x(merged[0], inner[i].shape[1:3])
            merged.insert(0, inner[i] + td)

        outs = []
        for i, m in enumerate(merged):
            x = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=(self.norm == "none"),
                        kernel_init=_kaiming_uniform_a1, dtype=self.dtype,
                        name=f"fpn_layer{i + 1}")(m)
            if self.norm != "none":
                x = make_norm(self.norm, name=f"fpn_layer{i + 1}_norm")(x)
            if self.use_relu:
                x = nn.relu(x)
            outs.append(x)

        if self.top_block == "maxpool":
            # reference LastLevelMaxPool: max_pool kernel 1, stride 2
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        elif self.top_block == "p6p7":
            src = features[-1] if self.p6p7_in_from_c5 else outs[-1]
            p6 = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                         padding=((1, 1), (1, 1)), kernel_init=_kaiming_uniform_a1,
                         dtype=self.dtype, name="fpn_p6")(src.astype(self.dtype))
            p7 = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                         padding=((1, 1), (1, 1)), kernel_init=_kaiming_uniform_a1,
                         dtype=self.dtype, name="fpn_p7")(nn.relu(p6))
            outs.extend([p6, p7])
        return outs
