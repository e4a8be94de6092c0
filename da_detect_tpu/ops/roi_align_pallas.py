"""ROIAlign as a Pallas TPU kernel (forward + hand-written backward).

Status: correct and tested, but NOT the production path. At the C4 parity
shape (R=256, P=14, 38x76x1024 map) it measures ~11 ms fwd vs ~5 ms for the
layout-tuned einsum formulation (ops/roi_align.py): the per-ROI separable
matmuls have M = R_BLK*P and K = H — both far below the 128x128 MXU tile —
so the kernel's 512 sequential grid steps run the MXU at ~13% while the
einsum path amortizes its HBM intermediate across one big contraction.
Kept as a library op (dispatchable via roi_align(use_pallas=True)) for
larger pooled resolutions or a future schedule that blocks ROIs into the
contraction dimensions.

This kernel keeps the whole feature map block VMEM-resident and runs the same
separable contraction per ROI block, so the only HBM traffic is the feature
map (once per channel block) and the pooled outputs:

    t   = (Ay_blk @ F)            [R_BLK*P, W*C_BLK]   (MXU)
    out =  Ax_blk ⊙w t            [R_BLK, P, P, C_BLK] (MXU, batched)

Backward (d/dF only — ROI coordinates come from stop_gradient'd proposals)
accumulates dF in a float32 VMEM block across the ROI grid dimension:

    u  = Ax_blkᵀ ⊙q g             [R_BLK, P, W, C_BLK]
    dF += Ay_blkᵀ @ u             [H, W*C_BLK]

Interpolation matrices Ay/Ax are built by the shared ``_interp_matrix`` (same
numerics as the einsum path and the reference CUDA kernel,
csrc/cuda/ROIAlign_cuda.cu:65-175). Results match the einsum path bit-for-bit
up to bf16 reduction order.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# toggled by tests to run the kernel in interpreter mode on CPU
INTERPRET = False

R_BLK = 4
C_BLK = 256


def _fwd_kernel(ay_ref, ax_ref, f_ref, out_ref):
    r_blk, p, h = ay_ref.shape[1:]
    w = ax_ref.shape[3]
    c = f_ref.shape[3]
    ay = ay_ref[0].reshape(r_blk * p, h)
    f2 = f_ref[0].reshape(h, w * c)
    # Mosaic requires 32-bit matmul accumulators; cast back between the two
    # contractions like the einsum path's bf16 dots do
    t = jnp.dot(ay, f2, preferred_element_type=jnp.float32)  # [r*p, w*c]
    t = t.astype(f_ref.dtype).reshape(r_blk, p, w, c)
    # out[r, q, p, c] = sum_w ax[r, q, w] * t[r, p, w, c]
    o = jax.lax.dot_general(ax_ref[0], t, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    out_ref[0] = o.transpose(0, 2, 1, 3).astype(out_ref.dtype)


def _bwd_kernel(ay_ref, ax_ref, g_ref, df_ref):
    r_idx = pl.program_id(2)
    r_blk, p, h = ay_ref.shape[1:]
    w = ax_ref.shape[3]
    c = g_ref.shape[4]
    g = g_ref[0]                                          # [r, p, q, c]
    # u[r, w, p, c] = sum_q ax[r, q, w] * g[r, p, q, c]
    u = jax.lax.dot_general(ax_ref[0], g, (((1,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    u = u.astype(g.dtype).transpose(0, 2, 1, 3).reshape(r_blk * p, w * c)
    ay2 = ay_ref[0].reshape(r_blk * p, h)
    # df[h, w*c] = sum_rp ay2[rp, h] * u[rp, w*c]  — accumulate in f32
    df = jax.lax.dot_general(ay2, u, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    df = df.reshape(h, w, c)

    @pl.when(r_idx == 0)
    def _():
        df_ref[0] = df

    @pl.when(r_idx > 0)
    def _():
        df_ref[0] = df_ref[0] + df


def _pad_rois(ay, ax):
    r = ay.shape[1]
    r_pad = -(-r // R_BLK) * R_BLK
    if r_pad != r:
        pad = ((0, 0), (0, r_pad - r), (0, 0), (0, 0))
        ay = jnp.pad(ay, pad)
        ax = jnp.pad(ax, pad)
    return ay, ax, r_pad


def _c_blk(c):
    return C_BLK if c % C_BLK == 0 else c


@jax.custom_vjp
def _pool(features, ay, ax):
    return _pool_fwd_impl(features, ay, ax)


def _pool_fwd_impl(features, ay, ax):
    b, h, w, c = features.shape
    r = ay.shape[1]
    p = ay.shape[2]
    ayp, axp, r_pad = _pad_rois(ay, ax)
    cb = _c_blk(c)
    grid = (b, c // cb, r_pad // R_BLK)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, R_BLK, p, h), lambda bi, ci, ri: (bi, ri, 0, 0)),
            pl.BlockSpec((1, R_BLK, p, w), lambda bi, ci, ri: (bi, ri, 0, 0)),
            pl.BlockSpec((1, h, w, cb), lambda bi, ci, ri: (bi, 0, 0, ci)),
        ],
        out_specs=pl.BlockSpec((1, R_BLK, p, p, cb),
                               lambda bi, ci, ri: (bi, ri, 0, 0, ci)),
        out_shape=jax.ShapeDtypeStruct((b, r_pad, p, p, c), features.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=INTERPRET,
    )(ayp, axp, features)
    return out[:, :r]


def _pool_fwd(features, ay, ax):
    # ay/ax are already cast to the feature dtype, so they carry it
    return _pool_fwd_impl(features, ay, ax), (ay, ax)


def _pool_bwd(res, g):
    ay, ax = res
    fdtype = ay.dtype
    b, r, p, _, c = g.shape
    h = ay.shape[3]
    w = ax.shape[3]
    ayp, axp, r_pad = _pad_rois(ay, ax)
    if r_pad != r:
        g = jnp.pad(g, ((0, 0), (0, r_pad - r), (0, 0), (0, 0), (0, 0)))
    cb = _c_blk(c)
    grid = (b, c // cb, r_pad // R_BLK)
    df = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, R_BLK, p, h), lambda bi, ci, ri: (bi, ri, 0, 0)),
            pl.BlockSpec((1, R_BLK, p, w), lambda bi, ci, ri: (bi, ri, 0, 0)),
            pl.BlockSpec((1, R_BLK, p, p, cb),
                         lambda bi, ci, ri: (bi, ri, 0, 0, ci)),
        ],
        out_specs=pl.BlockSpec((1, h, w, cb),
                               lambda bi, ci, ri: (bi, 0, 0, ci)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=INTERPRET,
    )(ayp, axp, g)
    return df.astype(fdtype), jnp.zeros_like(ay), jnp.zeros_like(ax)


_pool.defvjp(_pool_fwd, _pool_bwd)


def fits_vmem(features_shape, itemsize: int, output_size: int = 14) -> bool:
    """Whether the per-block working set comfortably fits VMEM (~16 MB)."""
    _, h, w, c = features_shape
    cb = _c_blk(c)
    f_block = h * w * cb * itemsize
    t_block = R_BLK * output_size * w * cb * 4        # f32 matmul acc
    return f_block + t_block < 8 * 1024 * 1024


def roi_align_pallas(features: jnp.ndarray, rois: jnp.ndarray, *,
                     spatial_scale: float, output_size: int,
                     sampling_ratio: int = 0,
                     max_samples: int = 8) -> jnp.ndarray:
    """Batched ROIAlign: features [B, H, W, C], rois [B, R, 4] ->
    [B, R, P, P, C]. Drop-in for ops.roi_align.roi_align."""
    from .roi_align import _interp_matrix, _roi_grid

    b, h, w, _ = features.shape
    p = output_size
    dtype = jnp.float32
    rois = rois.astype(dtype)
    s = sampling_ratio if sampling_ratio > 0 else max_samples

    start_h, start_w, bin_h, bin_w, grid_h, grid_w = _roi_grid(
        rois, spatial_scale, p, sampling_ratio, max_samples)

    mk = jax.vmap(partial(_interp_matrix, pooled=p, max_samples=s,
                          dtype=dtype), in_axes=(0, 0, 0, None))
    ay = mk(start_h, bin_h, grid_h, h).astype(features.dtype)  # [B, R, P, H]
    ax = mk(start_w, bin_w, grid_w, w).astype(features.dtype)  # [B, R, P, W]
    return _pool(features, ay, ax)
