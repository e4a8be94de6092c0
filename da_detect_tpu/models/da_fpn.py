"""Multi-level (FPN) domain-adaptation heads — optional variant.

Equivalent of the reference's design sketch da_heads/da_heads_fpn.py (303
LoC, dead code there — SURVEY §2.6): per-level image domain classifiers, a
joint scale head, and a scale discriminator that classifies *which pyramid
level* a feature came from (scale-awareness regularizer). Provided as
opt-in building blocks; the shipped DA method uses models/da.py.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.grl import gradient_scalar
from ..ops.losses import bce_with_logits, softmax_cross_entropy

_normal0001 = nn.initializers.normal(0.001)


class DAJointScaleHead(nn.Module):
    """Shared 1x1 tower applied per level + per-level logits
    (reference da_heads_fpn.py DAJointScaleHead:72)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: list[jnp.ndarray]) -> list[jnp.ndarray]:
        conv1 = nn.Conv(512, (1, 1), kernel_init=_normal0001, dtype=self.dtype,
                        name="conv1_joint")
        conv2 = nn.Conv(1, (1, 1), kernel_init=_normal0001, dtype=self.dtype,
                        name="conv2_joint")
        return [conv2(nn.relu(conv1(f.astype(self.dtype)))) for f in features]


class ScaleDiscriminator(nn.Module):
    """Classifies the pyramid level of globally-pooled features
    (reference da_heads_fpn.py ScaleDiscriminator:110)."""

    num_levels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: list[jnp.ndarray]) -> jnp.ndarray:
        pooled = [jnp.mean(f.astype(self.dtype), axis=(1, 2)) for f in features]
        x = jnp.concatenate(pooled, axis=0)           # [L*B, C]
        x = nn.relu(nn.Dense(256, name="fc1")(x))
        return nn.Dense(self.num_levels, name="fc2")(x)


class MultiLevelDAModule(nn.Module):
    """Per-level image DA + scale-discriminator regularizer."""

    grl_weight: float = 0.1
    scale_weight: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: list[jnp.ndarray], is_source: jnp.ndarray):
        losses = {}
        grl_feas = [gradient_scalar(f, -self.grl_weight) for f in features]
        logits = DAJointScaleHead(dtype=self.dtype, name="scale_head")(grl_feas)
        total, count = 0.0, 0.0
        for lvl in logits:
            b = lvl.shape[0]
            lv = lvl.astype(jnp.float32).reshape(b, -1)
            lab = jnp.broadcast_to(is_source[:, None].astype(jnp.float32),
                                   lv.shape)
            total = total + bce_with_logits(lv, lab, reduction="sum")
            count = count + lv.size
        losses["loss_da_image_mlvl"] = total / count

        if self.scale_weight > 0:
            disc = ScaleDiscriminator(num_levels=len(features),
                                      dtype=self.dtype, name="scale_disc")
            sl = disc(features)
            b = features[0].shape[0]
            level_labels = jnp.repeat(jnp.arange(len(features)), b)
            losses["loss_scale_disc"] = self.scale_weight * softmax_cross_entropy(
                sl.astype(jnp.float32), level_labels)
        return losses
