"""SSIM / PSNR image-quality metrics, NHWC, pure JAX.

Matches the reference's pytorch_ssim (efficientderain-master/
pytorch_ssim/__init__.py:7-37): 11-tap sigma-1.5 gaussian window applied
depthwise with same-padding, C1 = 0.01^2, C2 = 0.03^2 on unit-range images.
Used by the deraining trainer both as an optional loss term (1 - SSIM) and
as the validation metric (trainer.py:40-45, validation.py).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def _gaussian_window(window_size: int, sigma: float) -> jnp.ndarray:
    g = jnp.asarray([math.exp(-((x - window_size // 2) ** 2)
                              / (2.0 * sigma ** 2))
                     for x in range(window_size)], jnp.float32)
    g = g / g.sum()
    return jnp.outer(g, g)                      # [W, W]


def _depthwise_blur(x: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    c = x.shape[-1]
    k = window[:, :, None, None] * jnp.ones((1, 1, 1, c), window.dtype)
    pad = window.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


@partial(jax.jit, static_argnames=("window_size", "size_average"))
def ssim(img1: jnp.ndarray, img2: jnp.ndarray, *, window_size: int = 11,
         sigma: float = 1.5, size_average: bool = True) -> jnp.ndarray:
    """img1/img2 [B, H, W, C] in [0, 1]. Returns a scalar (size_average)
    or per-image [B] SSIM."""
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    w = _gaussian_window(window_size, sigma)
    mu1 = _depthwise_blur(img1, w)
    mu2 = _depthwise_blur(img2, w)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_blur(img1 * img1, w) - mu1_sq
    sigma2_sq = _depthwise_blur(img2 * img2, w) - mu2_sq
    sigma12 = _depthwise_blur(img1 * img2, w) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = (((2 * mu1_mu2 + c1) * (2 * sigma12 + c2))
                / ((mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)))
    if size_average:
        return ssim_map.mean()
    return ssim_map.mean(axis=(1, 2, 3))


@jax.jit
def psnr(img1: jnp.ndarray, img2: jnp.ndarray,
         data_range: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB over unit-range images (the
    reference's validation metric, efficientderain-master/utils.py)."""
    mse = jnp.mean((img1.astype(jnp.float32) - img2.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))
