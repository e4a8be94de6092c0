"""ROIAlign/ROIPool vs clean-room numpy oracles implementing the original
(non-aligned) algorithms — the same role the reference's CPU kernels play
(csrc/cpu/ROIAlign_cpu.cpp as numerics oracle, SURVEY §7.2 step 1)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from da_detect_tpu.ops.roi_align import roi_align_image, roi_pool_image


def np_bilinear(feat, y, x):
    h, w = feat.shape[:2]
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(feat.shape[2])
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_lo, x_lo = int(y), int(x)
    if y_lo >= h - 1:
        y_hi = y_lo = h - 1
        y = float(y_lo)
    else:
        y_hi = y_lo + 1
    if x_lo >= w - 1:
        x_hi = x_lo = w - 1
        x = float(x_lo)
    else:
        x_hi = x_lo + 1
    ly, lx = y - y_lo, x - x_lo
    hy, hx = 1 - ly, 1 - lx
    return (hy * hx * feat[y_lo, x_lo] + hy * lx * feat[y_lo, x_hi]
            + ly * hx * feat[y_hi, x_lo] + ly * lx * feat[y_hi, x_hi])


def np_roi_align(feat, rois, scale, p, sampling_ratio):
    out = np.zeros((len(rois), p, p, feat.shape[2]))
    h, w = feat.shape[:2]
    for r, roi in enumerate(rois):
        sw, sh = roi[0] * scale, roi[1] * scale
        rw = max(roi[2] * scale - sw, 1.0)
        rh = max(roi[3] * scale - sh, 1.0)
        bw, bh = rw / p, rh / p
        gh = sampling_ratio if sampling_ratio > 0 else math.ceil(rh / p)
        gw = sampling_ratio if sampling_ratio > 0 else math.ceil(rw / p)
        for ph in range(p):
            for pw in range(p):
                acc = np.zeros(feat.shape[2])
                for iy in range(gh):
                    y = sh + ph * bh + (iy + 0.5) * bh / gh
                    for ix in range(gw):
                        x = sw + pw * bw + (ix + 0.5) * bw / gw
                        acc += np_bilinear(feat, y, x)
                out[r, ph, pw] = acc / (gh * gw)
    return out


def np_roi_pool(feat, rois, scale, p):
    h, w = feat.shape[:2]
    out = np.zeros((len(rois), p, p, feat.shape[2]))
    for r, roi in enumerate(rois):
        sw, sh = round(roi[0] * scale), round(roi[1] * scale)
        ew, eh = round(roi[2] * scale), round(roi[3] * scale)
        rw = max(ew - sw + 1, 1)
        rh = max(eh - sh + 1, 1)
        bw, bh = rw / p, rh / p
        for ph in range(p):
            for pw in range(p):
                eps = 1e-4  # same boundary snap as the implementation
                y0 = min(max(int(math.floor(ph * bh + eps)) + sh, 0), h)
                y1 = min(max(int(math.ceil((ph + 1) * bh - eps)) + sh, 0), h)
                x0 = min(max(int(math.floor(pw * bw + eps)) + sw, 0), w)
                x1 = min(max(int(math.ceil((pw + 1) * bw - eps)) + sw, 0), w)
                if y1 > y0 and x1 > x0:
                    out[r, ph, pw] = feat[y0:y1, x0:x1].max(axis=(0, 1))
    return out


def make_case(seed, h=25, w=38, c=6, n=12, img_scale=16.0):
    rng = np.random.RandomState(seed)
    feat = rng.randn(h, w, c).astype(np.float32)
    x1 = rng.uniform(-10, w * img_scale * 0.9, n)
    y1 = rng.uniform(-10, h * img_scale * 0.9, n)
    bw = rng.uniform(4, w * img_scale / 2, n)
    bh = rng.uniform(4, h * img_scale / 2, n)
    rois = np.stack([x1, y1, x1 + bw, y1 + bh], 1).astype(np.float32)
    return feat, rois


@pytest.mark.parametrize("ratio", [1, 2, 3])
def test_roi_align_fixed_ratio(ratio):
    feat, rois = make_case(ratio)
    want = np_roi_align(feat, rois, 1.0 / 16, 7, ratio)
    got = roi_align_image(jnp.asarray(feat), jnp.asarray(rois),
                          spatial_scale=1.0 / 16, output_size=7,
                          sampling_ratio=ratio)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_roi_align_adaptive():
    """sampling_ratio=0: adaptive grid — the shipped C4 config
    (POOLER_SAMPLING_RATIO=0, POOLER_RESOLUTION=14)."""
    feat, rois = make_case(7, h=38, w=76)
    want = np_roi_align(feat, rois, 1.0 / 16, 14, 0)
    got = roi_align_image(jnp.asarray(feat), jnp.asarray(rois),
                          spatial_scale=1.0 / 16, output_size=14,
                          sampling_ratio=0, max_samples=4)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_roi_align_adaptive_canvas_wide_roi():
    """A proposal spanning the whole 1216-px-wide parity canvas needs
    ceil(76/14) = 6 adaptive samples per bin — more than the old cap of 4;
    the default max_samples=8 must reproduce the uncapped reference count."""
    rng = np.random.RandomState(3)
    h, w = 38, 76  # C4 map of a 608x1216 canvas
    feat = rng.randn(h, w, 8).astype(np.float32)
    rois = np.asarray([[2.0, 2.0, 1210.0, 600.0],     # nearly canvas-sized
                       [0.0, 100.0, 1216.0, 180.0],   # elongated full-width
                       [30.0, 40.0, 200.0, 300.0]], np.float32)
    want = np_roi_align(feat, rois, 1.0 / 16, 14, 0)  # uncapped ceil oracle
    got = roi_align_image(jnp.asarray(feat), jnp.asarray(rois),
                          spatial_scale=1.0 / 16, output_size=14,
                          sampling_ratio=0)           # default max_samples
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_roi_align_oob_rois():
    """ROIs fully/partially outside the feature map must not blow up."""
    feat, _ = make_case(9)
    rois = np.asarray([[-100.0, -100.0, -50.0, -50.0],
                       [1e4, 1e4, 2e4, 2e4],
                       [0.0, 0.0, 0.0, 0.0]], np.float32)
    got = np.asarray(roi_align_image(jnp.asarray(feat), jnp.asarray(rois),
                                     spatial_scale=1.0 / 16, output_size=7,
                                     sampling_ratio=2))
    assert np.all(np.isfinite(got))
    want = np_roi_align(feat, rois, 1.0 / 16, 7, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roi_align_grad_is_finite_and_linear():
    feat, rois = make_case(11)
    f = jnp.asarray(feat)

    def loss(x):
        return jnp.sum(roi_align_image(x, jnp.asarray(rois),
                                       spatial_scale=1.0 / 16, output_size=7,
                                       sampling_ratio=2) ** 2)

    g = jax.grad(loss)(f)
    assert np.all(np.isfinite(np.asarray(g)))
    # linear op: grad of sum(out) == column sums of the interpolation weights,
    # so doubling features doubles grad of the quadratic loss
    g2 = jax.grad(loss)(2.0 * f)
    np.testing.assert_allclose(np.asarray(g2), 2 * np.asarray(g), rtol=1e-4, atol=1e-5)


def test_roi_pool_matches_numpy():
    feat, rois = make_case(13)
    want = np_roi_pool(feat, rois, 1.0 / 16, 7)
    got = roi_pool_image(jnp.asarray(feat), jnp.asarray(rois),
                         spatial_scale=1.0 / 16, output_size=7)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
