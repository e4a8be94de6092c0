"""Deformable convolution (DCNv1/v2), pure-JAX gather formulation.

The reference ships 2.3k lines of CUDA for deformable im2col/col2im
(csrc/cuda/deform_conv_kernel_cuda.cu, deform_pool_kernel_cuda.cu) but never
binds them in this fork (csrc/vision.cpp omits them — SURVEY §2.1) and its
dcn configs are broken. Here DCN is actually wired: offsets (and modulation
masks, for v2) come from an internal zero-initialized conv, sampling is
bilinear gather, and the contraction with the kernel weights is an einsum on
the MXU. Backward comes from autodiff (the CUDA col2im/grad kernels are the
hand-written transpose of exactly this graph).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def _bilinear_gather(x: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """x [H, W, C]; ys/xs [...] sample coords. Zero padding outside."""
    h, w, _ = x.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = ys - y0
    lx = xs - x0

    def tap(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat = x.reshape(-1, x.shape[-1])
        vals = flat[yc * w + xc]
        return jnp.where(inb[..., None], vals, 0.0)

    return ((1 - ly)[..., None] * (1 - lx)[..., None] * tap(y0, x0)
            + (1 - ly)[..., None] * lx[..., None] * tap(y0, x0 + 1)
            + ly[..., None] * (1 - lx)[..., None] * tap(y0 + 1, x0)
            + ly[..., None] * lx[..., None] * tap(y0 + 1, x0 + 1))


class DeformConv2d(nn.Module):
    features: int
    kernel_size: int = 3
    strides: int = 1
    dilation: int = 1
    feature_group_count: int = 1
    deformable_groups: int = 1
    modulated: bool = False
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        k = self.kernel_size
        pad = self.dilation * (k - 1) // 2
        oh = (h + 2 * pad - self.dilation * (k - 1) - 1) // self.strides + 1
        ow = (w + 2 * pad - self.dilation * (k - 1) - 1) // self.strides + 1
        nk = k * k
        dg = self.deformable_groups

        # offset/mask predictor: zero-init so training starts as a plain conv
        # (reference layers/dcn/deform_conv_module.py ModulatedDeformConvPack
        # init_offset zeroes weight and bias)
        n_out = dg * nk * (3 if self.modulated else 2)
        om = nn.Conv(n_out, (k, k), strides=(self.strides,) * 2,
                     padding=((pad, pad), (pad, pad)),
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     dtype=self.dtype, name="conv_offset")(x)
        om = om.astype(jnp.float32)
        if self.modulated:
            off, mask_logits = om[..., : dg * 2 * nk], om[..., dg * 2 * nk:]
            mask = nn.sigmoid(mask_logits).reshape(b, oh, ow, dg, nk)
        else:
            off = om
            mask = jnp.ones((b, oh, ow, dg, nk), jnp.float32)
        # reference CUDA layout: per (dg, kernel tap) pairs of (dy, dx)
        off = off.reshape(b, oh, ow, dg, nk, 2)

        # base sampling grid
        ky, kx = jnp.meshgrid(jnp.arange(k, dtype=jnp.float32),
                              jnp.arange(k, dtype=jnp.float32), indexing="ij")
        ky = (ky * self.dilation).reshape(-1)  # [nk]
        kx = (kx * self.dilation).reshape(-1)
        base_y = (jnp.arange(oh, dtype=jnp.float32) * self.strides - pad)
        base_x = (jnp.arange(ow, dtype=jnp.float32) * self.strides - pad)
        ys = base_y[:, None, None] + ky[None, None, :] + 0.0  # [oh,1,nk]
        xs = base_x[None, :, None] + kx[None, None, :]        # [1,ow,nk]
        ys = jnp.broadcast_to(ys, (oh, ow, nk))
        xs = jnp.broadcast_to(xs, (oh, ow, nk))

        cg = c // dg  # channels per deformable group

        def one_image(xi, offi, maski):
            cols = []
            for g in range(dg):
                sy = ys + offi[..., g, :, 0]
                sx = xs + offi[..., g, :, 1]
                sampled = _bilinear_gather(xi[..., g * cg:(g + 1) * cg], sy, sx)
                cols.append(sampled * maski[..., g, :, None])
            return jnp.concatenate(cols, axis=-1)  # [oh, ow, nk, c] grouped

        xf = x.astype(jnp.float32)
        cols = jax.vmap(one_image)(xf, off, mask)
        # cols [b, oh, ow, nk, c] -> contract with kernel [k, k, c/fg, features]
        kernel = self.param(
            "kernel", nn.initializers.he_normal(),
            (k, k, c // self.feature_group_count, self.features), jnp.float32)
        cols = cols.reshape(b, oh, ow, nk, c).astype(self.dtype)
        kq = kernel.reshape(nk, c // self.feature_group_count, self.features).astype(self.dtype)
        if self.feature_group_count == 1:
            out = jnp.einsum("bhwkc,kcf->bhwf", cols, kq)
        else:
            fg = self.feature_group_count
            cpg = c // fg
            fpg = self.features // fg
            cols_g = cols.reshape(b, oh, ow, nk, fg, cpg)
            kq_g = kq.reshape(nk, cpg, fg, fpg)
            out = jnp.einsum("bhwkgc,kcgf->bhwgf", cols_g, kq_g).reshape(
                b, oh, ow, self.features)
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.features,), jnp.float32).astype(out.dtype)
        return out
