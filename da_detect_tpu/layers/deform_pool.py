"""Deformable position-sensitive ROI pooling (DCN).

Equivalent of the reference's deform_pool CUDA kernels
(csrc/cuda/deform_pool_kernel_cuda.cu, 364 LoC + module wrappers
layers/dcn/deform_pool_module.py:6-128) — which its fork never binds
(SURVEY §2.1, lowest priority). Pure-JAX bilinear-gather formulation:
position-sensitive score maps [H, W, P*P*C'] pooled per bin with learned
per-bin offsets; backward via autodiff.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .deform_conv import _bilinear_gather


def deform_ps_roi_pool(features: jnp.ndarray, rois: jnp.ndarray,
                       offsets: jnp.ndarray | None, *, spatial_scale: float,
                       output_size: int, out_channels: int,
                       sample_per_part: int = 4, trans_std: float = 0.1):
    """features [H, W, P*P*C']; rois [R, 4] xyxy image coords;
    offsets [R, P, P, 2] normalized (or None) -> [R, P, P, C']."""
    p = output_size
    h, w, _ = features.shape
    rois = rois.astype(jnp.float32)
    # reference kernel: rounded roi, sizes clamped >= 0.1
    x1 = jnp.round(rois[:, 0]) * spatial_scale - 0.5
    y1 = jnp.round(rois[:, 1]) * spatial_scale - 0.5
    x2 = (jnp.round(rois[:, 2]) + 1.0) * spatial_scale - 0.5
    y2 = (jnp.round(rois[:, 3]) + 1.0) * spatial_scale - 0.5
    rw = jnp.maximum(x2 - x1, 0.1)
    rh = jnp.maximum(y2 - y1, 0.1)
    bin_w = rw / p
    bin_h = rh / p
    sub_w = bin_w / sample_per_part
    sub_h = bin_h / sample_per_part

    ph = jnp.arange(p, dtype=jnp.float32)
    iy = jnp.arange(sample_per_part, dtype=jnp.float32)
    # sample grid per (bin, subsample): [R, P, S]
    ys = (y1[:, None, None] + ph[None, :, None] * bin_h[:, None, None]
          + (iy[None, None, :] + 0.5) * sub_h[:, None, None])
    xs = (x1[:, None, None] + ph[None, :, None] * bin_w[:, None, None]
          + (iy[None, None, :] + 0.5) * sub_w[:, None, None])
    if offsets is not None:
        ys = ys[:, :, None, :, None] + (offsets[..., 1] * trans_std
                                        * rh[:, None, None])[:, :, :, None, None]
        xs = xs[:, None, :, None, :] + (offsets[..., 0] * trans_std
                                        * rw[:, None, None])[:, :, :, None, None]
        ys = jnp.broadcast_to(ys, ys.shape[:2] + (p, sample_per_part,
                                                  sample_per_part))
        xs = jnp.broadcast_to(xs, (xs.shape[0], p) + xs.shape[2:])
    else:
        ys = jnp.broadcast_to(ys[:, :, None, :, None],
                              (rois.shape[0], p, p, sample_per_part,
                               sample_per_part))
        xs = jnp.broadcast_to(xs[:, None, :, None, :],
                              (rois.shape[0], p, p, sample_per_part,
                               sample_per_part))

    cpp = features.shape[-1] // (p * p)
    fmap = features.reshape(h, w, p * p, cpp)

    def per_roi(y, x):
        # y, x: [P, P, S, S]; gather from the (ph*P+pw) channel group
        def per_bin(ph_i, pw_i):
            vals = _bilinear_gather(fmap[:, :, ph_i * p + pw_i, :],
                                    y[ph_i, pw_i], x[ph_i, pw_i])
            return jnp.mean(vals, axis=(0, 1))

        rows = []
        for ph_i in range(p):
            rows.append(jnp.stack([per_bin(ph_i, pw_i) for pw_i in range(p)]))
        return jnp.stack(rows)  # [P, P, C']

    return jax.vmap(per_roi)(ys, xs)[..., :out_channels]


class DeformRoIPooling(nn.Module):
    """Module pair of the reference's DeformRoIPooling/
    ModulatedDeformRoIPoolingPack (layers/dcn/deform_pool_module.py)."""

    spatial_scale: float
    output_size: int
    out_channels: int
    no_trans: bool = False
    trans_std: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, rois):
        offsets = None
        if not self.no_trans:
            # offset branch: pool without offsets, predict per-bin offsets
            base = deform_ps_roi_pool(
                features, rois, None, spatial_scale=self.spatial_scale,
                output_size=self.output_size, out_channels=self.out_channels,
                trans_std=self.trans_std)
            flat = base.reshape(base.shape[0], -1).astype(self.dtype)
            hidden = nn.relu(nn.Dense(1024, name="offset_fc1")(flat))
            off = nn.Dense(self.output_size * self.output_size * 2,
                           kernel_init=nn.initializers.zeros,
                           name="offset_fc2")(hidden)
            offsets = off.reshape(-1, self.output_size, self.output_size, 2)
            offsets = offsets.astype(jnp.float32)
        return deform_ps_roi_pool(
            features, rois, offsets, spatial_scale=self.spatial_scale,
            output_size=self.output_size, out_channels=self.out_channels,
            trans_std=self.trans_std)
