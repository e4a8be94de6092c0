"""Deformable convolution (DCNv1/v2), TPU-native tap-scanned formulation.

The reference ships 2.3k lines of CUDA for deformable im2col/col2im
(csrc/cuda/deform_conv_kernel_cuda.cu, deform_pool_kernel_cuda.cu) but never
binds them in this fork (csrc/vision.cpp omits them — SURVEY §2.1) and its
dcn configs are broken. Here DCN is actually wired and the lowering is
shaped by measurement on v5e:

- A naive deformable-im2col materializes ``cols [oh, ow, k*k, C]`` and lets
  autodiff save it — at X-101 res3 full-canvas that is ~213 MB f32 *per
  layer*, which pushed the 30-DCN-layer triplet step past the 16 GB HBM
  ceiling (the round-1 "worker crashed at step 2" failure), and XLA wrapped
  the per-tap gathers in thousands of layout reshape/copy ops (~50k HLO ops,
  592 ms/step at quarter canvas — profiled).
- This version ``lax.scan``s over the k*k kernel taps. Each tap does ONE
  combined 4-corner row-gather from the flattened feature map and contracts
  immediately into the output accumulator, so the live transient is a
  single ``[oh*ow, C]`` buffer. The scan body is ``jax.checkpoint``ed: the
  backward pass re-gathers instead of saving per-tap samples, keeping the
  residual footprint to the (tiny) precomputed corner indices/weights.
- Bilinear corner weights, the out-of-bounds zero mask, and the DCNv2
  modulation mask are all folded into one per-corner weight tensor before
  the scan — the gathered values are used exactly once.
- Grouped (ResNeXt) kernels reuse the block-diagonal DENSE lowering from
  the backbone (models/backbone/resnet.py BlockDiagGroupedConv): small-width
  grouped contractions starve the 128-lane MXU, so for width <= 16 the tap
  kernel is scattered into a dense [C, features] block-diagonal matrix
  (exact math, g x nominal FLOPs, near-peak MXU).

Sampling semantics match the reference CUDA kernel
(csrc/cuda/deform_conv_kernel_cuda.cu deformable_im2col): bilinear
interpolation with zero outside the feature map, offsets zero-initialized so
training starts as a plain conv (layers/dcn/deform_conv_module.py
init_offset). Backward comes from autodiff (the CUDA col2im/grad kernels are
the hand-written transpose of exactly this graph).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def _corner_indices(ys, xs, h, w):
    """ys/xs [...] float sample coords -> per-corner flat row indices,
    bilinear weights and in-bounds masks, each [..., 4]."""
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = ys - y0
    lx = xs - x0
    ycs = jnp.stack([y0, y0, y0 + 1, y0 + 1], axis=-1)
    xcs = jnp.stack([x0, x0 + 1, x0, x0 + 1], axis=-1)
    wts = jnp.stack([(1 - ly) * (1 - lx), (1 - ly) * lx,
                     ly * (1 - lx), ly * lx], axis=-1)
    inb = (ycs >= 0) & (ycs < h) & (xcs >= 0) & (xcs < w)
    idx = (jnp.clip(ycs, 0, h - 1) * w
           + jnp.clip(xcs, 0, w - 1)).astype(jnp.int32)
    return idx, jnp.where(inb, wts, 0.0)


def _quad_slot_weights(ys, xs, h, w):
    """Quad-table variant of :func:`_corner_indices`: one flat row index per
    sample into the overlapped 4-corner table (``flat4[i] = [f[i], f[i+1],
    f[i+w], f[i+w+1]]``) plus per-slot weights [..., 4].

    The table base is the floor corner clamped to [0, h-2] x [0, w-2]; each
    slot's weight is the bilinear weight of whichever true corner lands on
    that slot's absolute coordinate (zero when clamping shifted the window or
    the true corner is out of bounds) — numerically identical to the
    per-corner form, including edge and fully-OOB samples."""
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = ys - y0
    lx = xs - x0
    y0c = jnp.clip(y0, 0, h - 2)
    x0c = jnp.clip(x0, 0, w - 2)
    wy = [jnp.where(y0c + dy == y0, 1 - ly, 0.0)
          + jnp.where(y0c + dy == y0 + 1, ly, 0.0) for dy in (0, 1)]
    wx = [jnp.where(x0c + dx == x0, 1 - lx, 0.0)
          + jnp.where(x0c + dx == x0 + 1, lx, 0.0) for dx in (0, 1)]
    wts = jnp.stack([wy[0] * wx[0], wy[0] * wx[1],
                     wy[1] * wx[0], wy[1] * wx[1]], axis=-1)
    idx = (y0c * w + x0c).astype(jnp.int32)
    return idx, wts


def _gather_tap_quad(flat4, idx, wts):
    """flat4 [N', 4C] overlapped-corner table; idx [B, P] table rows
    (pre-offset per image); wts [B, P, 4] slot weights -> [B, P, C].
    One wide take instead of four narrow ones — probes whether XLA's
    row-gather is row-issue-bound (scripts/bench_gather.py)."""
    c = flat4.shape[-1] // 4
    r = flat4.at[idx.reshape(-1)].get(mode="promise_in_bounds")
    r = r.reshape(idx.shape + (4, c))
    return jnp.einsum("bpk,bpkc->bpc", wts.astype(flat4.dtype), r)


def _gather_tap(flat, idx, wts):
    """flat [N, C]; idx [B, P, 4] flat-row indices (pre-offset per image,
    pre-clipped in-bounds by _corner_indices); wts [B, P, 4]. Four corner
    gathers, weighted sum -> [B, P, C]. Four separate takes measured 26%
    faster fwd (7% fwd+bwd) than one combined [B*P*4] take on v5e, and
    promise_in_bounds drops the OOB select (zeroing rides the weights)."""
    acc = 0
    for k in range(4):
        vals = flat.at[idx[..., k].reshape(-1)].get(mode="promise_in_bounds")
        vals = vals.reshape(idx.shape[:-1] + (flat.shape[-1],))
        acc = acc + wts[..., k, None].astype(flat.dtype) * vals
    return acc


def _bilinear_gather(x: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """x [H, W, C]; ys/xs [...] float sample coords. Bilinear interpolation
    with zero padding outside the map -> [..., C]. Used by the deformable
    PS-ROI pooling (layers/deform_pool.py); the DeformConv2d hot path below
    inlines the same corner math tap-by-tap instead."""
    h, w, c = x.shape
    idx, wts = _corner_indices(ys, xs, h, w)       # [..., 4]
    flat = x.reshape(h * w, c)
    acc = 0
    for k in range(4):
        vals = flat.at[idx[..., k].reshape(-1)].get(mode="promise_in_bounds")
        vals = vals.reshape(idx.shape[:-1] + (c,))
        acc = acc + wts[..., k, None].astype(x.dtype) * vals
    return acc


class DeformConv2d(nn.Module):
    features: int
    kernel_size: int = 3
    strides: int = 1
    dilation: int = 1
    feature_group_count: int = 1
    deformable_groups: int = 1
    modulated: bool = False
    use_bias: bool = False
    grouped_dense_max_width: int = 16
    # "four": four narrow per-corner takes; "quad": one wide take from an
    # overlapped 4-corner table (TPU.DCN_GATHER; requires deformable_groups=1)
    gather_mode: str = "four"
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
        fg = self.feature_group_count

        # offset/mask predictor: zero-init so training starts as a plain conv
        # (reference layers/dcn/deform_conv_module.py ModulatedDeformConvPack
        # init_offset zeroes weight and bias)
        n_out = dg * nk * (3 if self.modulated else 2)
        om = nn.Conv(n_out, (k, k), strides=(self.strides,) * 2,
                     padding=((pad, pad), (pad, pad)),
                     kernel_dilation=(self.dilation,) * 2,
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     dtype=self.dtype, name="conv_offset")(x)
        om = om.astype(jnp.float32)
        if self.modulated:
            off, mask_logits = om[..., : dg * 2 * nk], om[..., dg * 2 * nk:]
            mask = nn.sigmoid(mask_logits).reshape(b, oh, ow, dg, nk)
        else:
            off = om
            mask = None
        # reference CUDA layout: per (dg, kernel tap) pairs of (dy, dx)
        off = off.reshape(b, oh, ow, dg, nk, 2)

        # base sampling grid
        ky, kx = jnp.meshgrid(jnp.arange(k, dtype=jnp.float32),
                              jnp.arange(k, dtype=jnp.float32), indexing="ij")
        ky = (ky * self.dilation).reshape(-1)  # [nk]
        kx = (kx * self.dilation).reshape(-1)
        base_y = (jnp.arange(oh, dtype=jnp.float32) * self.strides - pad)
        base_x = (jnp.arange(ow, dtype=jnp.float32) * self.strides - pad)
        by = (base_y[:, None] + ky[None, :]).reshape(1, oh, 1, 1, nk)
        bx = (base_x[:, None] + kx[None, :]).reshape(1, 1, ow, 1, nk)
        ys = by + off[..., 0]  # [b, oh, ow, dg, nk]
        xs = bx + off[..., 1]

        quad = (self.gather_mode == "quad" and dg == 1
                and h >= 2 and w >= 2)
        if self.gather_mode not in ("four", "quad"):
            raise ValueError(f"unknown gather_mode: {self.gather_mode}")
        if quad:
            # one row index per sample into the overlapped 4-corner table +
            # 4 slot weights: idx [b, oh*ow, dg, nk], wts [..., 4]
            idx, wts = _quad_slot_weights(ys, xs, h, w)
            idx = idx.reshape(b, oh * ow, dg, nk)
        else:
            # per-corner indices/weights for every tap, [b, oh*ow, dg, nk, 4]
            idx, wts = _corner_indices(ys, xs, h, w)
            idx = idx.reshape(b, oh * ow, dg, nk, 4)
        wts = wts.reshape(b, oh * ow, dg, nk, 4)
        if mask is not None:
            # DCNv2 modulation scales the whole sample — fold into the
            # corner weights so the gathered values are touched once
            wts = wts * mask.reshape(b, oh * ow, dg, nk)[..., None]
        # offset each image's rows into the batch-flattened feature map
        # (quad-table rows use the same [b*h*w] stride: row r of image i's
        # table is table[i*h*w + r] — the overlapped rows never cross an
        # image boundary because y0c <= h-2 and x0c <= w-2)
        idx = idx + (jnp.arange(b, dtype=jnp.int32) * (h * w)).reshape(
            (b,) + (1,) * (idx.ndim - 1))

        kernel = self.param(
            "kernel", nn.initializers.he_normal(),
            (k, k, c // fg, self.features), jnp.float32)
        kq = kernel.reshape(nk, c // fg, self.features).astype(self.dtype)

        cpf = c // fg  # input width per feature group
        dense_ok = fg == 1 or cpf <= self.grouped_dense_max_width
        if fg > 1 and dense_ok:
            # block-diagonal dense lowering (see module docstring): scatter
            # the grouped kernel into [nk, C, features]; the extra FLOPs
            # multiply structural zeros but the MXU runs at dense efficiency
            eye = jnp.eye(fg, dtype=self.dtype)
            fpg = self.features // fg
            kq = jnp.einsum("tigo,Gg->tGigo",
                            kq.reshape(nk, cpf, fg, fpg), eye).reshape(
                nk, c, self.features)

        flat = x.astype(self.dtype).reshape(b * h * w, c)
        if quad:
            # overlapped-corner table: flat4[i] = [f[i], f[i+1], f[i+w],
            # f[i+w+1]] — two streamed concats (6x fmap bytes at HBM peak),
            # amortized over the nk taps' gathers
            flat2 = jnp.concatenate([flat[:-1], flat[1:]], axis=-1)
            flat4 = jnp.concatenate([flat2[:-w], flat2[w:]], axis=-1)

        def tap_body(acc, tap):
            t_idx, t_wts, t_k = tap  # [b,P,dg(,4)], [b,P,dg,4], [nk-slice]
            if quad:
                samp = _gather_tap_quad(flat4, t_idx[:, :, 0],
                                        t_wts[:, :, 0])
            elif dg == 1:
                samp = _gather_tap(flat, t_idx[:, :, 0], t_wts[:, :, 0])
            else:
                cg = c // dg
                parts = []
                for gi in range(dg):
                    sub = flat.reshape(b * h * w, dg, cg)[:, gi]
                    parts.append(_gather_tap(sub, t_idx[:, :, gi],
                                             t_wts[:, :, gi]))
                samp = jnp.concatenate(parts, axis=-1)
            # f32 accumulation across taps (matches the f32 accumulators a
            # dense conv would use inside the MXU)
            if fg == 1 or dense_ok:
                acc = acc + jnp.einsum("bpc,cf->bpf", samp, t_k,
                                       preferred_element_type=jnp.float32)
            else:
                samp_g = samp.reshape(b, oh * ow, fg, cpf)
                kg = t_k.reshape(cpf, fg, self.features // fg)
                acc = acc + jnp.einsum(
                    "bpgc,cgf->bpgf", samp_g, kg,
                    preferred_element_type=jnp.float32).reshape(
                    b, oh * ow, self.features)
            return acc, None

        acc0 = jnp.zeros((b, oh * ow, self.features), jnp.float32)
        idx_t = (idx.transpose(3, 0, 1, 2) if quad
                 else idx.transpose(3, 0, 1, 2, 4))
        taps = (idx_t, wts.transpose(3, 0, 1, 2, 4), kq)
        # checkpoint: backward re-gathers per tap instead of saving the
        # [b, P, C] sample buffer for all nk taps (the round-1 OOM)
        out, _ = jax.lax.scan(jax.checkpoint(tap_body), acc0, taps)
        out = out.reshape(b, oh, ow, self.features)
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.features,), jnp.float32).astype(out.dtype)
        return out
