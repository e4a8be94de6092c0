"""KPN deraining network (EfficientDeRain).

Equivalent of the reference's vendored efficientderain-master/network.py:89-252
(KPN / KernelConv / LossFunc): a U-Net predicts per-pixel NxN filter kernels
that are applied to the rainy input ("kernel prediction network"). Only the
rain *synthesis* script is needed to reproduce DA-Detect (SURVEY §2.8), but
the deraining net is part of the reference's capability surface, so a
TPU-native version lives here: the per-pixel kernel application is an
unfold-free einsum over shifted feature stacks (MXU-friendly), not a CUDA
im2col.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def apply_per_pixel_kernels(x: jnp.ndarray, kernels: jnp.ndarray,
                            ksize: int = 5) -> jnp.ndarray:
    """x [B, H, W, C]; kernels [B, H, W, K*K] (softmaxed) -> filtered x.

    Equivalent of the reference KernelConv (network.py:154-252): each output
    pixel is a kernel-weighted sum of its KxK neighborhood. Implemented as a
    sum over K*K shifted copies — XLA fuses this into tight VPU code.
    """
    k = ksize
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    h, w = x.shape[1:3]
    out = jnp.zeros_like(x)
    idx = 0
    for dy in range(k):
        for dx in range(k):
            shifted = xp[:, dy:dy + h, dx:dx + w, :]
            out = out + shifted * kernels[..., idx:idx + 1]
            idx += 1
    return out


class ConvBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(2):
            x = nn.relu(nn.Conv(self.features, (3, 3), padding="SAME",
                                dtype=self.dtype, name=f"conv{i}")(x))
        return x


class KPN(nn.Module):
    """U-Net encoder/decoder emitting per-pixel 5x5 kernels
    (reference network.py KPN:89-152)."""

    ksize: int = 5
    base: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rainy: jnp.ndarray) -> jnp.ndarray:
        x = rainy.astype(self.dtype)
        e1 = ConvBlock(self.base, self.dtype, name="enc1")(x)
        e2 = ConvBlock(self.base * 2, self.dtype, name="enc2")(
            nn.avg_pool(e1, (2, 2), (2, 2)))
        e3 = ConvBlock(self.base * 4, self.dtype, name="enc3")(
            nn.avg_pool(e2, (2, 2), (2, 2)))
        mid = ConvBlock(self.base * 8, self.dtype, name="mid")(
            nn.avg_pool(e3, (2, 2), (2, 2)))

        def up(t, skip, feats, name):
            t = jax.image.resize(t, (t.shape[0], skip.shape[1], skip.shape[2],
                                     t.shape[3]), "bilinear")
            t = jnp.concatenate([t, skip], axis=-1)
            return ConvBlock(feats, self.dtype, name=name)(t)

        d3 = up(mid, e3, self.base * 4, "dec3")
        d2 = up(d3, e2, self.base * 2, "dec2")
        d1 = up(d2, e1, self.base, "dec1")
        kernels = nn.Conv(self.ksize * self.ksize, (3, 3), padding="SAME",
                          dtype=self.dtype, name="kernel_head")(d1)
        kernels = jax.nn.softmax(kernels.astype(jnp.float32), axis=-1)
        return apply_per_pixel_kernels(rainy.astype(jnp.float32), kernels,
                                       self.ksize)


class BasicRef(nn.Module):
    """Reference ``Basic`` block (network.py:41-88, attention off as in the
    vendored train.py defaults): three 3x3 conv+ReLU."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(3):
            x = nn.relu(nn.Conv(self.features, (3, 3), padding="SAME",
                                dtype=self.dtype, name=f"conv{i}")(x))
        return x


def _up2(t, skip):
    """2x bilinear upsample to the skip's spatial dims (torch
    F.interpolate(scale_factor=2, mode='bilinear'), half-pixel centers)."""
    return jax.image.resize(
        t, (t.shape[0], skip.shape[1], skip.shape[2], t.shape[3]), "bilinear")


def kernel_conv_ref(x: jnp.ndarray, core: jnp.ndarray, ksize: int,
                    rate: int) -> jnp.ndarray:
    """Reference ``KernelConv`` on a 4D frame (network.py:154-252, the
    train.py path where the color axis is folded into N): per-channel KxK
    per-pixel kernels at dilation ``rate``, zero padding, NO softmax.

    x [B, H, W, C]; core [B, H, W, C*K*K] with flat channel c = n*K*K + tap
    (torch ``core.view(B, N, K*K, 1, H, W)`` layout), tap = dy*K + dx.
    """
    k2 = ksize * ksize
    b, h, w, c = x.shape
    pad = (ksize // 2) * rate
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    # [B, H, W, K*K, C]: taps in row-major (dy, dx) reference order
    taps = jnp.stack(
        [xp[:, dy * rate:dy * rate + h, dx * rate:dx * rate + w, :]
         for dy in range(ksize) for dx in range(ksize)], axis=3)
    core = core.reshape(b, h, w, c, k2)          # c-major, tap-minor
    return jnp.einsum("bhwtc,bhwct->bhwc", taps, core)


class KPNRef(nn.Module):
    """Reference-exact EfficientDeRain KPN (network.py:89-152) with the
    vendored train.py defaults: color, burst_length=1, blind_est,
    kernel_size=[3], no sep_conv / attention / core bias. NHWC flax port
    whose forward matches the torch module on shared weights
    (tests/test_derain.py parity)."""

    ksize: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rainy: jnp.ndarray) -> jnp.ndarray:
        x = rainy.astype(self.dtype)
        out_ch = 3 * self.ksize * self.ksize
        pool = lambda t: nn.avg_pool(t, (2, 2), (2, 2))
        c1 = BasicRef(64, self.dtype, name="conv1")(x)
        c2 = BasicRef(128, self.dtype, name="conv2")(pool(c1))
        c3 = BasicRef(256, self.dtype, name="conv3")(pool(c2))
        c4 = BasicRef(512, self.dtype, name="conv4")(pool(c3))
        c5 = BasicRef(512, self.dtype, name="conv5")(pool(c4))
        c6 = BasicRef(512, self.dtype, name="conv6")(
            jnp.concatenate([c4, _up2(c5, c4)], axis=-1))
        c7 = BasicRef(256, self.dtype, name="conv7")(
            jnp.concatenate([c3, _up2(c6, c3)], axis=-1))
        c8 = BasicRef(out_ch, self.dtype, name="conv8")(
            jnp.concatenate([c2, _up2(c7, c2)], axis=-1))
        core = nn.Conv(out_ch, (1, 1), dtype=self.dtype,
                       name="outc")(_up2(c8, x))
        core = core.astype(jnp.float32)
        preds = [kernel_conv_ref(rainy.astype(jnp.float32), core,
                                 self.ksize, rate) for rate in (1, 2, 3, 4)]
        return nn.Conv(3, (3, 3), padding="SAME", dtype=self.dtype,
                       name="conv_final")(jnp.concatenate(preds, axis=-1))


def derain_loss(pred: jnp.ndarray, clean: jnp.ndarray,
                l1_weight: float = 1.0) -> jnp.ndarray:
    """L2 + TV-ish L1 composite (reference LossFunc: basic + anneal terms,
    simplified to the converged-phase objective)."""
    l2 = jnp.mean((pred - clean) ** 2)
    dy = jnp.abs(jnp.diff(pred, axis=1) - jnp.diff(clean, axis=1)).mean()
    dx = jnp.abs(jnp.diff(pred, axis=2) - jnp.diff(clean, axis=2)).mean()
    return l2 + l1_weight * (dx + dy)
