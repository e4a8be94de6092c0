"""Differentiable layers (reference maskrcnn_benchmark/layers/).

Most reference layers dissolve into plain jnp under XLA:
* empty-tensor-safe Conv2d / interpolate (layers/misc.py) — unnecessary with
  static shapes + masks
* smooth_l1 / focal loss / consistency loss -> ops.losses and models.da
* nms / roi_align wrappers -> ops.nms / ops.roi_align
What remains here are actual nn modules.
"""

from .norms import FrozenBatchNorm, make_norm
from .deform_conv import DeformConv2d

__all__ = ["FrozenBatchNorm", "make_norm", "DeformConv2d"]
