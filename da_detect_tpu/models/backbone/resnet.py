"""ResNe[X]t backbone, flax.linen, NHWC.

Re-design of the reference cfg-driven ResNet
(maskrcnn_benchmark/modeling/backbone/resnet.py:80-417): stem + stages of
bottleneck blocks, FrozenBatchNorm (inference-statistics BN folded to a
per-channel affine — reference layers/batch_norm.py:6-24), optional GroupNorm
variants, stride_in_1x1 Caffe2 convention, ResNeXt grouped conv2, optional
per-stage deformable conv (the reference's dcn configs reference this but its
fork never wires it — we do).

TPU notes: NHWC layout, configurable compute dtype (params stay f32,
activations/weights cast per block — bf16 keeps the MXU fed), stage freezing
is expressed as an optimizer mask (see solver/optim.py) rather than
requires_grad mutation; FrozenBN lives in a separate "frozen" variable
collection so it can never be trained.

Also fixes the reference's missing ResNeXt stage specs: the X-101-32x8d
configs there select plain R-101 bodies (SURVEY §2.5); here NUM_GROUPS /
WIDTH_PER_GROUP apply to every body.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...layers import FrozenBatchNorm, make_norm
from ...layers.deform_conv import DeformConv2d


class BlockDiagGroupedConv(nn.Module):
    """Grouped 3x3 conv lowered as a block-diagonal DENSE conv.

    ResNeXt's small groups starve the MXU: profiled on v5e, X-101-32x8d's
    res2 grouped convs (32 groups of width 8) run at ~0.2 TFLOP/s — 8-wide
    contractions waste 94% of the 128-lane systolic array, and XLA inserts
    multi-ms layout copies around the [.., g, w] group split. Scattering the
    grouped kernel into a block-diagonal [kh, kw, C, C] dense kernel costs
    g x the nominal FLOPs but runs at dense-conv efficiency — a large net
    win for w <= 16. Parameters keep the grouped nn.Conv layout
    ([kh, kw, C/g, C], same "kernel" name), so checkpoints are
    interchangeable with the native form, and the math is exact (the extra
    terms are multiplications by structural zeros).
    """

    features: int
    groups: int
    strides: tuple = (1, 1)
    padding: tuple = ((1, 1), (1, 1))
    kernel_dilation: tuple = (1, 1)
    kernel_size: tuple = (3, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = self.groups
        w_in = x.shape[-1] // g
        w_out = self.features // g
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, w_in, self.features))
        kg = kernel.astype(self.dtype).reshape(kh, kw, w_in, g, w_out)
        eye = jnp.eye(g, dtype=self.dtype)
        # dense[h, w, G*w_in + i, g*w_out + o] = kg[h, w, i, g, o] * (G == g)
        dense = jnp.einsum("hwigo,Gg->hwGigo", kg, eye).reshape(
            kh, kw, g * w_in, self.features)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), dense, self.strides, self.padding,
            rhs_dilation=self.kernel_dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class Bottleneck(nn.Module):
    bottleneck_channels: int
    out_channels: int
    stride: int = 1
    dilation: int = 1
    num_groups: int = 1
    stride_in_1x1: bool = True
    norm: str = "frozen_bn"  # "frozen_bn" | "gn"
    with_dcn: bool = False
    with_modulated_dcn: bool = False
    deformable_groups: int = 1
    grouped_dense_max_width: int = 16
    dcn_gather: str = "four"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        stride_1x1, stride_3x3 = ((self.stride, 1) if self.stride_in_1x1
                                  else (1, self.stride))
        norm = lambda name: make_norm(self.norm, name=name)

        shortcut = x
        if in_channels != self.out_channels or self.stride != 1:
            shortcut = nn.Conv(self.out_channels, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            shortcut = norm("downsample_bn")(shortcut)

        out = nn.Conv(self.bottleneck_channels, (1, 1), strides=(stride_1x1,) * 2,
                      use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(norm("bn1")(out))
        if self.with_dcn:
            out = DeformConv2d(self.bottleneck_channels, kernel_size=3,
                               strides=stride_3x3, dilation=self.dilation,
                               feature_group_count=self.num_groups,
                               deformable_groups=self.deformable_groups,
                               modulated=self.with_modulated_dcn,
                               grouped_dense_max_width=self.grouped_dense_max_width,
                               gather_mode=self.dcn_gather,
                               dtype=self.dtype, name="conv2")(out)
        elif (self.num_groups > 1 and self.bottleneck_channels
                // self.num_groups <= self.grouped_dense_max_width):
            out = BlockDiagGroupedConv(
                features=self.bottleneck_channels, groups=self.num_groups,
                strides=(stride_3x3,) * 2,
                padding=((self.dilation,) * 2,) * 2,
                kernel_dilation=(self.dilation,) * 2,
                dtype=self.dtype, name="conv2")(out)
        else:
            out = nn.Conv(self.bottleneck_channels, (3, 3), strides=(stride_3x3,) * 2,
                          padding=((self.dilation,) * 2,) * 2,
                          kernel_dilation=(self.dilation,) * 2,
                          feature_group_count=self.num_groups,
                          use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = nn.relu(norm("bn2")(out))
        out = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv3")(out)
        out = norm("bn3")(out)
        return nn.relu(out + shortcut)


class _StemConv7x7(nn.Module):
    """The stem's 7x7 stride-2 conv, optionally applied in space-to-depth
    form: a 3-channel input keeps the MXU ~97% idle (profiled at
    ~3.7 TFLOP/s), so fold 2x2 pixel blocks into channels and run the exact
    algebraic equivalent — a 4x4 stride-1 conv over [H/2, W/2, 12] with the
    7x7 weights scattered into a [4, 4, 12, C] kernel (the MLPerf ResNet
    conv0 transform). Parameters stay in the reference [7, 7, Cin, C] layout
    either way, so checkpoints/weight converters are unaffected."""

    features: int = 64
    space_to_depth: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, cin, self.features))
        xd = x.astype(self.dtype)
        kd = kernel.astype(self.dtype)
        if not (self.space_to_depth
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
            return jax.lax.conv_general_dilated(
                xd, kd, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b, h, w, _ = x.shape
        s = xd.reshape(b, h // 2, 2, w // 2, 2, cin)
        s = s.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * cin)
        # out[y, x] = sum_{ky, kx} in[2y + ky - 3, 2x + kx - 3] w[ky, kx]
        # with in[2Y + dy] = s[Y, (dy, :)]: tap (a, dy) uses w[2a + dy - 1],
        # and the out-of-range ky = -1 taps are zero — realized by a front
        # zero-pad so w2[a, c, dy, dx] = wp[2a + dy, 2c + dx]
        wp = jnp.pad(kd, ((1, 0), (1, 0), (0, 0), (0, 0)))
        w2 = wp.reshape(4, 2, 4, 2, cin, self.features).transpose(
            0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * cin, self.features)
        return jax.lax.conv_general_dilated(
            s, w2, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class Stem(nn.Module):
    out_channels: int = 64
    norm: str = "frozen_bn"
    space_to_depth: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _StemConv7x7(features=self.out_channels,
                         space_to_depth=self.space_to_depth,
                         dtype=self.dtype, name="conv1")(x)
        x = nn.relu(make_norm(self.norm, name="bn1")(x))
        # torch MaxPool2d(kernel=3, stride=2, padding=1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        return x


class ResStage(nn.Module):
    """A sequence of bottleneck blocks (reference resnet.py _make_stage)."""

    block_count: int
    bottleneck_channels: int
    out_channels: int
    first_stride: int
    dilation: int = 1
    num_groups: int = 1
    stride_in_1x1: bool = True
    norm: str = "frozen_bn"
    with_dcn: bool = False
    with_modulated_dcn: bool = False
    deformable_groups: int = 1
    remat: bool = False
    grouped_dense_max_width: int = 16
    dcn_gather: str = "four"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # per-block rematerialization: backward recomputes each block's
        # internals instead of storing them (activation memory drops ~3x for
        # extra forward FLOPs); param names are unchanged, so checkpoints
        # are interchangeable with the non-remat model
        block_cls = nn.remat(Bottleneck) if self.remat else Bottleneck
        for i in range(self.block_count):
            x = block_cls(
                bottleneck_channels=self.bottleneck_channels,
                out_channels=self.out_channels,
                stride=self.first_stride if i == 0 else 1,
                dilation=self.dilation,
                num_groups=self.num_groups,
                stride_in_1x1=self.stride_in_1x1,
                norm=self.norm,
                with_dcn=self.with_dcn,
                with_modulated_dcn=self.with_modulated_dcn,
                deformable_groups=self.deformable_groups,
                grouped_dense_max_width=self.grouped_dense_max_width,
                dcn_gather=self.dcn_gather,
                dtype=self.dtype,
                name=f"block{i}",
            )(x)
        return x


# (stage index, blocks R-50, blocks R-101, blocks R-152)
_BLOCK_COUNTS = {
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class ResNet(nn.Module):
    """cfg-driven ResNet body.

    ``stages``: how many stages to run (3 for C4 bodies, 4 for C5/FPN).
    ``return_all``: return every stage output (FPN) vs the last only.
    """

    depth: int = 50
    stages: int = 4
    return_all: bool = False
    num_groups: int = 1
    width_per_group: int = 64
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    stride_in_1x1: bool = True
    res5_dilation: int = 1
    norm: str = "frozen_bn"
    stem_space_to_depth: bool = False
    stage_with_dcn: Sequence[bool] = (False, False, False, False)
    with_modulated_dcn: bool = False
    deformable_groups: int = 1
    remat: bool = False
    remat_level: str = "block"  # "block": per-bottleneck; "stage": whole stage
    grouped_dense_max_width: int = 16
    dcn_gather: str = "four"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = Stem(self.stem_out_channels, norm=self.norm,
                 space_to_depth=self.stem_space_to_depth, dtype=self.dtype,
                 name="stem")(x)
        outputs = []
        counts = _BLOCK_COUNTS[self.depth]
        # stage-level remat stores only each stage's input (block outputs are
        # recomputed inside the backward) — the stronger memory lever for big
        # canvases where even per-block remat leaves too many live outputs
        stage_remat = self.remat and self.remat_level == "stage"
        stage_cls = nn.remat(ResStage) if stage_remat else ResStage
        for idx in range(self.stages):
            stage2_relative = 2 ** idx
            bottleneck = self.num_groups * self.width_per_group * stage2_relative
            out_ch = self.res2_out_channels * stage2_relative
            dilation = self.res5_dilation if idx == 3 else 1
            first_stride = 1 if idx == 0 or (idx == 3 and self.res5_dilation == 2) else 2
            x = stage_cls(
                block_count=counts[idx],
                bottleneck_channels=bottleneck,
                out_channels=out_ch,
                first_stride=first_stride,
                dilation=dilation,
                num_groups=self.num_groups,
                stride_in_1x1=self.stride_in_1x1,
                norm=self.norm,
                with_dcn=bool(self.stage_with_dcn[idx]),
                with_modulated_dcn=self.with_modulated_dcn,
                deformable_groups=self.deformable_groups,
                remat=self.remat and not stage_remat,
                grouped_dense_max_width=self.grouped_dense_max_width,
                dcn_gather=self.dcn_gather,
                dtype=self.dtype,
                name=f"layer{idx + 1}",
            )(x)
            outputs.append(x)
        return outputs if self.return_all else [outputs[-1]]


class ResNetHead(nn.Module):
    """The res5 stage used as the C4 box-head feature extractor
    (reference resnet.py ResNetHead / roi_box_feature_extractors.py:13-45).

    Input: pooled ROI features [..., 14, 14, 1024] -> [..., 7, 7, 2048].
    """

    depth: int = 50
    num_groups: int = 1
    width_per_group: int = 64
    res2_out_channels: int = 256
    stride_in_1x1: bool = True
    first_stride: int = 2
    dilation: int = 1
    norm: str = "frozen_bn"
    remat: bool = False
    remat_level: str = "block"
    grouped_dense_max_width: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        counts = _BLOCK_COUNTS[self.depth]
        stage2_relative = 8  # res5
        stage_remat = self.remat and self.remat_level == "stage"
        stage_cls = nn.remat(ResStage) if stage_remat else ResStage
        return stage_cls(
            block_count=counts[3],
            bottleneck_channels=self.num_groups * self.width_per_group * stage2_relative,
            out_channels=self.res2_out_channels * stage2_relative,
            first_stride=self.first_stride,
            dilation=self.dilation,
            num_groups=self.num_groups,
            stride_in_1x1=self.stride_in_1x1,
            norm=self.norm,
            remat=self.remat and not stage_remat,
            grouped_dense_max_width=self.grouped_dense_max_width,
            dtype=self.dtype,
            name="layer4",
        )(x)
