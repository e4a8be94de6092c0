"""Backbone factory (reference modeling/backbone/backbone.py:11-73).

``build_backbone(cfg)`` returns (module, BackboneSpec). The registry keys
match the reference's CONV_BODY names; each maps to a ResNet(+FPN)
combination. FBNet mobile bodies are provided in models/backbone/fbnet.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import Registry
from .fpn import FPN
from .resnet import ResNet

BACKBONES = Registry()


@dataclasses.dataclass(frozen=True)
class BackboneSpec:
    out_channels: int
    strides: tuple[int, ...]  # feature stride per output level


class ResNetBackbone(nn.Module):
    """ResNet body, optionally topped with FPN."""

    depth: int
    stages: int
    with_fpn: bool = False
    fpn_out_channels: int = 256
    fpn_top_block: str = "maxpool"
    num_groups: int = 1
    width_per_group: int = 64
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    stride_in_1x1: bool = True
    res5_dilation: int = 1
    norm: str = "frozen_bn"
    stem_space_to_depth: bool = False
    fpn_norm: str = "none"
    fpn_use_relu: bool = False
    stage_with_dcn: Sequence[bool] = (False, False, False, False)
    with_modulated_dcn: bool = False
    deformable_groups: int = 1
    remat: bool = False
    remat_level: str = "block"
    grouped_dense_max_width: int = 16
    dcn_gather: str = "four"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = ResNet(
            depth=self.depth, stages=self.stages, return_all=self.with_fpn,
            num_groups=self.num_groups, width_per_group=self.width_per_group,
            stem_out_channels=self.stem_out_channels,
            res2_out_channels=self.res2_out_channels,
            stride_in_1x1=self.stride_in_1x1, res5_dilation=self.res5_dilation,
            norm=self.norm, stem_space_to_depth=self.stem_space_to_depth,
            stage_with_dcn=self.stage_with_dcn,
            with_modulated_dcn=self.with_modulated_dcn,
            deformable_groups=self.deformable_groups, remat=self.remat,
            remat_level=self.remat_level,
            grouped_dense_max_width=self.grouped_dense_max_width,
            dcn_gather=self.dcn_gather,
            dtype=self.dtype, name="body")(x)
        if self.with_fpn:
            if self.fpn_top_block == "p6p7":
                feats = feats[1:]  # RetinaNet pyramid starts at C3
            feats = FPN(out_channels=self.fpn_out_channels,
                        top_block=self.fpn_top_block, norm=self.fpn_norm,
                        use_relu=self.fpn_use_relu, dtype=self.dtype,
                        name="fpn")(feats)
        return feats


def _register_resnets():
    for depth in (50, 101, 152):
        BACKBONES.register(f"R-{depth}-C4", (depth, 3, False, "maxpool"))
        BACKBONES.register(f"R-{depth}-C5", (depth, 4, False, "maxpool"))
        BACKBONES.register(f"R-{depth}-FPN", (depth, 4, True, "maxpool"))
        BACKBONES.register(f"R-{depth}-FPN-RETINANET", (depth, 4, True, "p6p7"))
    # ResNeXt bodies use the same specs; groups/width come from cfg
    BACKBONES.register("X-101-32x8d-FPN", (101, 4, True, "maxpool"))


_register_resnets()


def build_backbone(cfg) -> tuple[nn.Module, BackboneSpec]:
    body = cfg.MODEL.BACKBONE.CONV_BODY
    if body.startswith("FBNet"):
        from .fbnet import build_fbnet_backbone
        return build_fbnet_backbone(cfg)
    if body.startswith("V"):  # VGG-16 (original DA-Faster backbone)
        from .vgg import build_vgg_backbone
        return build_vgg_backbone(cfg)
    if body not in BACKBONES:
        raise KeyError(f"unknown CONV_BODY: {body}")
    depth, stages, with_fpn, top_block = BACKBONES[body]
    r = cfg.MODEL.RESNETS
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    norm = "gn" if cfg.MODEL.BACKBONE.USE_GN else "frozen_bn"
    module = ResNetBackbone(
        depth=depth, stages=stages, with_fpn=with_fpn,
        fpn_out_channels=cfg.MODEL.BACKBONE.OUT_CHANNELS if with_fpn else 0,
        fpn_top_block=top_block,
        num_groups=r.NUM_GROUPS, width_per_group=r.WIDTH_PER_GROUP,
        stem_out_channels=r.STEM_OUT_CHANNELS,
        res2_out_channels=r.RES2_OUT_CHANNELS,
        stride_in_1x1=r.STRIDE_IN_1X1, res5_dilation=r.RES5_DILATION,
        norm=norm, stem_space_to_depth=cfg.TPU.STEM_SPACE_TO_DEPTH,
        fpn_norm="gn" if cfg.MODEL.FPN.USE_GN else "none",
        fpn_use_relu=cfg.MODEL.FPN.USE_RELU,
        stage_with_dcn=tuple(r.STAGE_WITH_DCN),
        with_modulated_dcn=r.WITH_MODULATED_DCN,
        deformable_groups=r.DEFORMABLE_GROUPS,
        remat=cfg.TPU.REMAT_BACKBONE,
        remat_level=cfg.TPU.REMAT_LEVEL,
        grouped_dense_max_width=cfg.TPU.GROUPED_DENSE_MAX_WIDTH,
        dcn_gather=cfg.TPU.DCN_GATHER,
        dtype=dtype,
    )
    if with_fpn:
        out_ch = cfg.MODEL.BACKBONE.OUT_CHANNELS
        strides = (4, 8, 16, 32, 64) if top_block == "maxpool" else (8, 16, 32, 64, 128)
    else:
        # C4/C5 single level
        stage_stride = 4 * 2 ** (stages - 1)
        out_ch = r.RES2_OUT_CHANNELS * 2 ** (stages - 1)
        strides = (stage_stride,)
    return module, BackboneSpec(out_channels=out_ch, strides=strides)
