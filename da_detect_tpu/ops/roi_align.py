"""ROIAlign re-designed for the MXU.

The reference implements ROIAlign as a CUDA gather kernel with a hand-written
backward (csrc/cuda/ROIAlign_cuda.cu:65-175 forward, :178-345 backward; the
*original* non-aligned variant — no -0.5 half-pixel offset). On TPU, per-point
gathers waste the hardware; bilinear sampling is separable, so we express it
as two small matmuls per ROI:

    pooled = (Ay @ F) @ Ax^T        Ay: [P*S, H], Ax: [P*S, W]

where each row of Ay/Ax holds the (at most two nonzero) bilinear row/column
weights of one vertical/horizontal sample coordinate. Both contractions run
on the MXU as batched einsums, the sample-average is folded into the weights,
and the backward comes for free via autodiff of the einsums (a transposed
matmul — exactly the hand-written CUDA backward, but generated).

Numerics match the reference kernel: no coordinate rounding, roi sizes
clamped to >= 1, the -1/H out-of-bounds rule, and edge clamping
(ROIAlign_cuda.cu:19-60 bilinear_interpolate).

``sampling_ratio == 0`` (adaptive ceil(roi_size/P) samples per bin,
data-dependent in the reference) is emulated with a static ``max_samples``
grid whose per-ROI excess samples get zero weight — identical results while
grid_h/w <= max_samples. The default (8, cfg TPU.ROI_MAX_SAMPLES) covers any
ROI side up to max_samples*P/scale (C4: 8*14*16 = 1792 px — wider than every
shipped canvas); an ROI longer than that gets max_samples uniformly-spaced
samples per bin instead of the reference's ceil count (only reachable on
FPN's fine levels for extremely elongated boxes, where the level mapper
normally assigns coarser levels). The sample sum is folded into the interp
matrices, so matmul cost does NOT grow with max_samples — only the
[R, P, S, A] weight build does (VPU, trivial).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _interp_matrix(starts, bin_sizes, grids, axis_size: int, pooled: int,
                   max_samples: int, dtype):
    """Per-ROI separable interpolation matrix, pre-summed over samples.

    starts [R], bin_sizes [R], grids [R] (samples per bin, <= max_samples).
    Returns [R, pooled, axis_size] with the 1/grid averaging factor folded in.
    The within-bin sample sum is linear, so it folds into the matrix itself
    (sum over the S axis here) instead of materializing a [.., P*S, ..]
    intermediate — 16x fewer matmul FLOPs and no post-reshape-sum buffer
    (which at C4 production shapes would otherwise be multi-GB).
    """
    ph = jnp.arange(pooled, dtype=dtype)[None, :, None]          # [1, P, 1]
    iy = jnp.arange(max_samples, dtype=dtype)[None, None, :]      # [1, 1, S]
    g = grids.astype(dtype)[:, None, None]                        # [R, 1, 1]
    coords = (starts[:, None, None] + ph * bin_sizes[:, None, None]
              + (iy + 0.5) * bin_sizes[:, None, None] / g)        # [R, P, S]
    sample_ok = iy < g                                            # [R, P, S]
    inb = (coords >= -1.0) & (coords <= axis_size)                # CUDA oob rule
    cc = jnp.clip(coords, 0.0, axis_size - 1)
    grid_pos = jnp.arange(axis_size, dtype=dtype)                 # [A]
    w = jnp.maximum(0.0, 1.0 - jnp.abs(cc[..., None] - grid_pos))  # [R, P, S, A]
    w = jnp.where((sample_ok & inb)[..., None], w, 0.0) / g[..., None]
    return w.sum(axis=2)                                          # [R, P, A]


def _roi_grid(rois, spatial_scale: float, pooled: int, sampling_ratio: int,
              max_samples: int):
    """Shared ROI preamble (reference ROIAlign_cuda.cu:70-96): start/size
    with the >=1 clamp, bin sizes, and the per-ROI adaptive sample grid.
    rois [..., 4] f32. Returns (start_h, start_w, bin_h, bin_w, grid_h,
    grid_w). Both the einsum and Pallas paths go through here so their
    numerics stay in lockstep."""
    s = sampling_ratio if sampling_ratio > 0 else max_samples
    start_w = rois[..., 0] * spatial_scale
    start_h = rois[..., 1] * spatial_scale
    roi_w = jnp.maximum(rois[..., 2] * spatial_scale - start_w, 1.0)
    roi_h = jnp.maximum(rois[..., 3] * spatial_scale - start_h, 1.0)
    bin_w = roi_w / pooled
    bin_h = roi_h / pooled
    if sampling_ratio > 0:
        grid_h = jnp.full_like(roi_h, s)
        grid_w = jnp.full_like(roi_w, s)
    else:
        grid_h = jnp.clip(jnp.ceil(roi_h / pooled), 1, s)
        grid_w = jnp.clip(jnp.ceil(roi_w / pooled), 1, s)
    return start_h, start_w, bin_h, bin_w, grid_h, grid_w


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio", "max_samples",
                                   "spatial_scale"))
def roi_align_image(features: jnp.ndarray, rois: jnp.ndarray, *,
                    spatial_scale: float, output_size: int,
                    sampling_ratio: int = 0, max_samples: int = 8) -> jnp.ndarray:
    """ROIAlign over one image. features [H, W, C], rois [R, 4] xyxy in image
    coordinates. Returns [R, P, P, C] (P = output_size).

    Invalid/padded ROIs are harmless (produce garbage rows the caller masks).
    """
    h, w, _ = features.shape
    p = output_size
    # coordinate/weight math stays f32 regardless of feature dtype — bf16
    # coordinates shift sample positions by whole pixels; only the big
    # contraction runs in the feature dtype
    dtype = jnp.float32
    rois = rois.astype(dtype)
    s = sampling_ratio if sampling_ratio > 0 else max_samples

    start_h, start_w, bin_h, bin_w, grid_h, grid_w = _roi_grid(
        rois, spatial_scale, p, sampling_ratio, max_samples)

    ay = _interp_matrix(start_h, bin_h, grid_h, h, p, s, dtype).astype(features.dtype)
    ax = _interp_matrix(start_w, bin_w, grid_w, w, p, s, dtype).astype(features.dtype)

    # contract the larger spatial axis first so the [R, P, other, C]
    # intermediate is as small as possible, and keep every index order
    # dot_general-natural (batch, lhs-free, rhs-free) — a non-natural order
    # makes XLA materialize a layout copy of the big intermediate, which at
    # the C4 parity shape costs ~3.5 ms/step (measured; scripts/profile_step.py)
    if w >= h:
        t = jnp.einsum("rqw,hwc->rqhc", ax, features)             # MXU
        out = jnp.einsum("rph,rqhc->rpqc", ay, t)                 # MXU
    else:
        t = jnp.einsum("rph,hwc->rpwc", ay, features)             # MXU
        out = jnp.einsum("rqw,rpwc->rpqc", ax, t)                 # MXU
    return out


def roi_align(features: jnp.ndarray, rois: jnp.ndarray, *,
              use_pallas: bool = False, **kwargs) -> jnp.ndarray:
    """Batched ROIAlign: features [B, H, W, C], rois [B, R, 4] -> [B, R, P, P, C].

    With ``use_pallas`` the VMEM-resident Pallas kernel handles feature maps
    that fit on-chip (the C4 head case); larger maps (high-res FPN levels)
    keep the einsum formulation, whose intermediates scale with C and stay
    moderate at FPN's 256 channels.
    """
    if use_pallas:
        from . import roi_align_pallas as rap
        if ((jax.default_backend() == "tpu" or rap.INTERPRET)
                and features.shape[-1] % 128 == 0
                and rap.fits_vmem(features.shape, features.dtype.itemsize,
                                  kwargs.get("output_size", 14))):
            return rap.roi_align_pallas(features, rois, **kwargs)
    return jax.vmap(lambda f, r: roi_align_image(f, r, **kwargs))(features, rois)


@partial(jax.jit, static_argnames=("output_size", "spatial_scale"))
def roi_pool_image(features: jnp.ndarray, rois: jnp.ndarray, *,
                   spatial_scale: float, output_size: int) -> jnp.ndarray:
    """ROIPool (max pooling with coordinate rounding), reference
    csrc/cuda/ROIPool_cuda.cu:17-77. Kept for capability parity; not used by
    the shipped DA configs. features [H, W, C], rois [R, 4] -> [R, P, P, C].

    Expressed as a max over a one-hot bin-membership mask — O(H*W*P^2) per
    ROI but P is small; fine for its rare uses.
    """
    h, w, c = features.shape
    p = output_size
    rois = rois.astype(jnp.float32)
    start_w = jnp.round(rois[:, 0] * spatial_scale)
    start_h = jnp.round(rois[:, 1] * spatial_scale)
    end_w = jnp.round(rois[:, 2] * spatial_scale)
    end_h = jnp.round(rois[:, 3] * spatial_scale)
    roi_w = jnp.maximum(end_w - start_w + 1.0, 1.0)
    roi_h = jnp.maximum(end_h - start_h + 1.0, 1.0)
    bin_w = roi_w / p
    bin_h = roi_h / p

    def bounds(start, bin_size, limit):
        # 1e-4 snap guards against XLA fma fusion nudging exact-integer bin
        # boundaries across the floor/ceil (e.g. 7 * (3/7) -> 3.0000002);
        # ROIPool has no parity target so the snap semantics are ours.
        eps = 1e-4
        idx = jnp.arange(p, dtype=jnp.float32)
        lo = jnp.floor(idx[None, :] * bin_size[:, None] + eps) + start[:, None]
        hi = jnp.ceil((idx[None, :] + 1.0) * bin_size[:, None] - eps) + start[:, None]
        return jnp.clip(lo, 0, limit), jnp.clip(hi, 0, limit)  # [R, P]

    ylo, yhi = bounds(start_h, bin_h, h)
    xlo, xhi = bounds(start_w, bin_w, w)
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    in_y = (ys[None, None, :] >= ylo[..., None]) & (ys[None, None, :] < yhi[..., None])  # [R,P,H]
    in_x = (xs[None, None, :] >= xlo[..., None]) & (xs[None, None, :] < xhi[..., None])  # [R,P,W]
    neg = jnp.asarray(-jnp.inf, features.dtype)
    # [R,P,1,H,1,1] & [R,1,P,1,W,1] -> mask over [H,W]
    masked = jnp.where(in_y[:, :, None, :, None, None] & in_x[:, None, :, None, :, None],
                       features[None, None, None, :, :, :], neg)
    out = jnp.max(masked, axis=(3, 4))
    # empty bins produce 0 like the CUDA kernel's is_empty case
    return jnp.where(jnp.isfinite(out), out, 0.0)
