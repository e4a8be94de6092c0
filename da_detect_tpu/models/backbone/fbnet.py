"""FBNet mobile search-space backbones and heads (reference
modeling/backbone/fbnet.py + fbnet_builder.py + fbnet_modeldef.py, ~1.3k LoC;
unused by any DA config — SURVEY §2.5).

The reference expresses each architecture as per-stage [expansion, channels,
num_blocks, stride] tables with per-block inverted-residual op types
(ir_k3/ir_k5/ir_k7) and splits the stages between the backbone trunk, the
RPN head, and the bbox head (fbnet_modeldef.py MODEL_ARCH / MODEL_ARCH_CHAM).
Same structure here, flattened to (expansion, channels, n, stride, kernel)
groups; channels honor MODEL.FBNET.SCALE_FACTOR / WIDTH_DIVISOR like
fbnet_builder._get_divisible_by. Heads register as "FBNet.rpn_head" /
"FBNet.roi_head" / "FBNet.roi_head_mask" (the names the reference's
fbnet configs select).

BN runs with fixed inference statistics (the detection fine-tuning regime;
stats load from converted weights or stay at identity for from-scratch).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# per arch: first conv (channels, stride), stages as groups of
# (expansion, channels, num_blocks, stride, kernel), and which stage indices
# form the trunk / rpn head / bbox head (fbnet_modeldef.py)
_ARCHS = {
    "default": dict(
        first=(32, 2),
        stages=(
            ((1, 16, 1, 1, 3),),
            ((6, 24, 2, 2, 3),),
            ((6, 32, 3, 2, 3),),
            ((6, 64, 4, 2, 3), (6, 96, 3, 1, 3)),
            ((4, 160, 1, 2, 3), (6, 160, 2, 1, 3), (6, 240, 1, 1, 3)),
            ((6, 96, 3, 1, 3),),
            ((4, 160, 1, 1, 3), (6, 160, 3, 1, 3), (3, 80, 1, -2, 3)),
        ),
        backbone=(0, 1, 2, 3), bbox=4, rpn=5, mask=6),
    "xirb16d_dsmask": dict(
        first=(16, 2),
        stages=(
            ((1, 16, 1, 1, 3),),
            ((6, 32, 2, 2, 3),),
            ((6, 48, 3, 2, 3),),
            ((6, 96, 4, 2, 3), (6, 128, 3, 1, 3)),
            ((4, 128, 1, 2, 3), (6, 128, 2, 1, 3), (6, 160, 1, 1, 3)),
            ((6, 128, 3, 1, 3),),
            ((4, 128, 1, 2, 3), (6, 128, 2, 1, 3), (6, 128, 1, -2, 3),
             (3, 64, 1, -2, 3)),
        ),
        backbone=(0, 1, 2, 3), bbox=4, rpn=5, mask=6),
    "mobilenet_v2": dict(
        first=(32, 2),
        stages=(
            ((1, 16, 1, 1, 3),),
            ((6, 24, 2, 2, 3),),
            ((6, 32, 3, 2, 3),),
            ((6, 64, 4, 2, 3), (6, 96, 3, 1, 3)),
            ((6, 160, 3, 1, 3), (6, 320, 1, 1, 3)),
        ),
        backbone=(0, 1, 2, 3), bbox=4, rpn=None, mask=None),
    "cham_v1a": dict(
        first=(32, 2),
        stages=(
            ((1, 24, 1, 1, 3),),
            ((4, 48, 2, 2, 7),),
            ((7, 64, 5, 2, 3),),
            ((12, 56, 7, 2, 5), (8, 88, 5, 1, 3)),
            ((7, 152, 4, 2, 3), (10, 104, 1, 1, 3)),
            ((8, 88, 3, 1, 3),),
        ),
        backbone=(0, 1, 2, 3), bbox=4, rpn=5, mask=None),
    "cham_v2": dict(
        first=(32, 2),
        stages=(
            ((1, 24, 1, 1, 3),),
            ((8, 32, 4, 2, 5),),
            ((5, 48, 6, 2, 7),),
            ((9, 56, 3, 2, 5), (6, 56, 6, 1, 3)),
            ((2, 160, 6, 2, 3), (6, 112, 1, 1, 3)),
            ((6, 56, 1, 1, 3),),
        ),
        backbone=(0, 1, 2, 3), bbox=4, rpn=5, mask=None),
}
_ARCHS["mnv2"] = _ARCHS["mobilenet_v2"]
_ARCHS["chamv1a"] = _ARCHS["cham_v1a"]
_ARCHS["chamv2"] = _ARCHS["cham_v2"]


def _divisible(c: float, divisor: int) -> int:
    """fbnet_builder._get_divisible_by."""
    d = max(1, divisor)
    ret = max(d, int(c + d / 2) // d * d)
    return ret


class MBConv(nn.Module):
    """Inverted residual (ir_k*) block, mirroring fbnet_builder.IRFBlock:
    the pointwise expansion is built even at expansion 1, the depthwise
    conv honors DW_CONV_SKIP_BN / DW_CONV_SKIP_RELU, the pw-linear is
    BN-only, and negative strides upsample (the mask-head stages)."""

    features: int
    expansion: int = 6
    stride: int = 1
    kernel: int = 3
    dw_skip_bn: bool = True
    dw_skip_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x.shape[-1]
        mid = inp * self.expansion
        h = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pw")(x)
        h = nn.relu(nn.BatchNorm(use_running_average=True, name="pw_bn")(h))
        if self.stride < 0:
            b, hh, ww, c = h.shape
            f = -self.stride
            h = jax.image.resize(h, (b, hh * f, ww * f, c), method="nearest")
            stride = 1
        else:
            stride = self.stride
        h = nn.Conv(mid, (self.kernel,) * 2, strides=(stride,) * 2,
                    padding="SAME", feature_group_count=mid, use_bias=False,
                    dtype=self.dtype, name="dw")(h)
        if not self.dw_skip_bn:
            h = nn.BatchNorm(use_running_average=True, name="dw_bn")(h)
        if not self.dw_skip_relu:
            h = nn.relu(h)
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pwl")(h)
        h = nn.BatchNorm(use_running_average=True, name="pwl_bn")(h)
        if self.stride == 1 and inp == self.features:
            h = h + x
        return h


class _Stages(nn.Module):
    """A run of MBConv groups (one arch stage list)."""

    groups: Sequence[tuple]
    scale: float = 1.0
    divisor: int = 1
    dw_skip_bn: bool = True
    dw_skip_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        i = 0
        for (t, c, n, s, k) in self.groups:
            ch = _divisible(c * self.scale, self.divisor)
            for j in range(n):
                x = MBConv(ch, t, s if j == 0 else 1, k,
                           dw_skip_bn=self.dw_skip_bn,
                           dw_skip_relu=self.dw_skip_relu, dtype=self.dtype,
                           name=f"block{i}")(x)
                i += 1
        return x


def _arch(cfg):
    name = cfg.MODEL.FBNET.ARCH
    if name not in _ARCHS:
        raise KeyError(f"unknown FBNET.ARCH: {name}")
    return _ARCHS[name]


def _stage_groups(arch, ids):
    out = []
    for i in (ids if isinstance(ids, (tuple, list)) else (ids,)):
        out.extend(arch["stages"][i])
    return tuple(out)


class FBNetTrunk(nn.Module):
    arch: dict
    scale: float = 1.0
    divisor: int = 1
    dw_skip_bn: bool = True
    dw_skip_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        first_ch, first_stride = self.arch["first"]
        ch = _divisible(first_ch * self.scale, self.divisor)
        x = nn.Conv(ch, (3, 3), strides=(first_stride,) * 2, padding="SAME",
                    use_bias=False, dtype=self.dtype,
                    name="first")(x.astype(self.dtype))
        x = nn.relu(nn.BatchNorm(use_running_average=True, name="first_bn")(x))
        x = _Stages(groups=_stage_groups(self.arch, self.arch["backbone"]),
                    scale=self.scale, divisor=self.divisor,
                    dw_skip_bn=self.dw_skip_bn, dw_skip_relu=self.dw_skip_relu,
                    dtype=self.dtype, name="stages")(x)
        return [x]


class FBNetRPNHead(nn.Module):
    """rpn-stage blocks + twin 1x1 logits/bbox convs (reference fbnet.py
    FBNetRPNHead + RPNHeadConvRegressor). Same API as models.rpn.RPNHead."""

    arch: dict
    num_anchors: int
    scale: float = 1.0
    divisor: int = 1
    dw_skip_bn: bool = True
    dw_skip_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features):
        stages = _Stages(groups=_stage_groups(self.arch, self.arch["rpn"]),
                         scale=self.scale, divisor=self.divisor,
                         dw_skip_bn=self.dw_skip_bn,
                         dw_skip_relu=self.dw_skip_relu,
                         dtype=self.dtype, name="head")
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                      name="cls_logits")
        reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                      name="bbox_pred")
        logits, deltas = [], []
        for f in features:
            t = stages(f.astype(self.dtype))
            logits.append(cls(t))
            deltas.append(reg(t))
        return logits, deltas


class FBNetRoIHead(nn.Module):
    """bbox-stage blocks over pooled ROIs, then global average pooling
    (reference fbnet.py FBNetROIHead; configs select it as FBNet.roi_head)."""

    pooler: dict
    arch: dict
    scale: float = 1.0
    divisor: int = 1
    dw_skip_bn: bool = True
    dw_skip_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, rois):
        from ..poolers import pool_rois
        x = pool_rois(features, rois, **self.pooler)        # [B, R, P, P, C]
        b, r = x.shape[:2]
        x = x.reshape((b * r,) + x.shape[2:])
        x = _Stages(groups=_stage_groups(self.arch, self.arch["bbox"]),
                    scale=self.scale, divisor=self.divisor,
                    dw_skip_bn=self.dw_skip_bn, dw_skip_relu=self.dw_skip_relu,
                    dtype=self.dtype, name="head")(x.astype(self.dtype))
        return x.reshape((b, r) + x.shape[1:])              # [B, R, p, p, C]


class FBNetMaskFeatureExtractor(nn.Module):
    """mask-stage blocks over pooled ROIs (reference fbnet.py FBNetROIHead
    with head_name="mask"; the -2 strides upsample back to RESOLUTION)."""

    pooler: dict
    arch: dict
    scale: float = 1.0
    divisor: int = 1
    dw_skip_bn: bool = True
    dw_skip_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, rois):
        from ..poolers import pool_rois
        x = pool_rois(features, rois, **self.pooler)
        b, r = x.shape[:2]
        x = x.reshape((b * r,) + x.shape[2:])
        x = _Stages(groups=_stage_groups(self.arch, self.arch["mask"]),
                    scale=self.scale, divisor=self.divisor,
                    dw_skip_bn=self.dw_skip_bn, dw_skip_relu=self.dw_skip_relu,
                    dtype=self.dtype, name="head")(x.astype(self.dtype))
        return x.reshape((b, r) + x.shape[1:])


def _head_out_channels(arch, which, scale, divisor) -> int:
    groups = _stage_groups(arch, arch[which])
    return _divisible(groups[-1][1] * scale, divisor)


def make_fbnet_roi_head(cfg, dtype):
    from ..poolers import pooler_config
    h = cfg.MODEL.ROI_BOX_HEAD
    f = cfg.MODEL.FBNET
    arch = _arch(cfg)
    pooler = pooler_config(cfg, "ROI_BOX_HEAD")
    mod = FBNetRoIHead(pooler=pooler, arch=arch, scale=f.SCALE_FACTOR,
                       divisor=f.WIDTH_DIVISOR, dw_skip_bn=f.DW_CONV_SKIP_BN,
                       dw_skip_relu=f.DW_CONV_SKIP_RELU, dtype=dtype,
                       name="feature_extractor")
    return mod, _head_out_channels(arch, "bbox", f.SCALE_FACTOR,
                                   f.WIDTH_DIVISOR)


def make_fbnet_mask_extractor(cfg, dtype):
    h = cfg.MODEL.ROI_MASK_HEAD
    f = cfg.MODEL.FBNET
    arch = _arch(cfg)
    if arch.get("mask") is None:
        raise KeyError(f"arch {f.ARCH} has no mask stage")
    from ..poolers import pooler_config
    pooler = pooler_config(cfg, "ROI_MASK_HEAD")
    return FBNetMaskFeatureExtractor(
        pooler=pooler, arch=arch, scale=f.SCALE_FACTOR,
        divisor=f.WIDTH_DIVISOR, dw_skip_bn=f.DW_CONV_SKIP_BN,
        dw_skip_relu=f.DW_CONV_SKIP_RELU, dtype=dtype, name="mask_extractor")


def make_fbnet_rpn_head(cfg, num_anchors, dtype):
    f = cfg.MODEL.FBNET
    arch = _arch(cfg)
    if arch["rpn"] is None:
        raise KeyError(f"arch {f.ARCH} has no rpn stage")
    return FBNetRPNHead(arch=arch, num_anchors=num_anchors,
                        scale=f.SCALE_FACTOR, divisor=f.WIDTH_DIVISOR,
                        dw_skip_bn=f.DW_CONV_SKIP_BN,
                        dw_skip_relu=f.DW_CONV_SKIP_RELU, dtype=dtype)


def build_fbnet_backbone(cfg):
    from .backbone import BackboneSpec
    f = cfg.MODEL.FBNET
    arch = _arch(cfg)
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    trunk = FBNetTrunk(arch=arch, scale=f.SCALE_FACTOR,
                       divisor=f.WIDTH_DIVISOR, dw_skip_bn=f.DW_CONV_SKIP_BN,
                       dw_skip_relu=f.DW_CONV_SKIP_RELU, dtype=dtype)
    out_ch = _head_out_channels(arch, "backbone", f.SCALE_FACTOR,
                                f.WIDTH_DIVISOR)
    return trunk, BackboneSpec(out_channels=out_ch, strides=(16,))
