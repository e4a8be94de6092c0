"""ROIAlign vs the REFERENCE'S ACTUAL C++ kernel.

The reference's csrc/cpu/ROIAlign_cpu.cpp is compiled at test time (torch
cpp_extension; two one-line API-drift patches applied to the in-memory
source — `.type()` dispatch macros) and used as the oracle for the
MXU-matmul ROIAlign. This replaces the round-1 situation where the only
ROIAlign oracles were self-authored (numpy + native/src/roi_align_cpu.cc):
the forward here is checked against the exact code the reference runs.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

CPP = "/root/reference/maskrcnn_benchmark/csrc/cpu/ROIAlign_cpu.cpp"
pytestmark = pytest.mark.skipif(not os.path.exists(CPP),
                                reason="reference csrc not available")


@pytest.fixture(scope="module")
def ref_kernel():
    from torch.utils.cpp_extension import load_inline

    src = open(CPP).read()
    # API drift only — the kernel body is untouched
    src = src.replace("input.type().is_cuda()", "input.is_cuda()")
    src = src.replace("rois.type().is_cuda()", "rois.is_cuda()")
    src = src.replace("AT_DISPATCH_FLOATING_TYPES(input.type(),",
                      "AT_DISPATCH_FLOATING_TYPES(input.scalar_type(),")
    src = src.replace('#include "cpu/vision.h"', "")
    mod = load_inline(name="ref_roi_align_cpu_oracle", cpp_sources=[src],
                      functions=["ROIAlign_forward_cpu"],
                      extra_cflags=["-O2"], verbose=False)
    return mod.ROIAlign_forward_cpu


def _rand_rois(rng, n, h, w, scale):
    """ROIs in image coordinates, including sub-bin, huge, and edge boxes."""
    x1 = rng.uniform(-5, w / scale * 0.9, (n,))
    y1 = rng.uniform(-5, h / scale * 0.9, (n,))
    bw = rng.uniform(0.5, w / scale * 0.7, (n,))
    bh = rng.uniform(0.5, h / scale * 0.7, (n,))
    return np.stack([x1, y1, x1 + bw, y1 + bh], 1).astype(np.float32)


@pytest.mark.parametrize("sampling_ratio", [0, 2])
@pytest.mark.parametrize("scale,pooled", [(0.0625, 14), (0.25, 7)])
def test_roi_align_matches_reference_kernel(ref_kernel, sampling_ratio,
                                            scale, pooled):
    from da_detect_tpu.ops.roi_align import roi_align_image

    rng = np.random.RandomState(42 + pooled + sampling_ratio)
    h, w, c = 24, 32, 12
    feats = rng.randn(h, w, c).astype(np.float32)
    rois = _rand_rois(rng, 24, h, w, scale)

    rois_t = torch.from_numpy(
        np.concatenate([np.zeros((len(rois), 1), np.float32), rois], 1))
    feats_nchw = np.ascontiguousarray(feats.transpose(2, 0, 1)[None])
    want = ref_kernel(torch.from_numpy(feats_nchw), rois_t, scale, pooled,
                      pooled, sampling_ratio).numpy()     # [R, C, P, P]

    got = roi_align_image(jnp.asarray(feats), jnp.asarray(rois),
                          spatial_scale=scale, output_size=pooled,
                          sampling_ratio=sampling_ratio)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roi_align_degenerate_rois_match(ref_kernel):
    """Zero-size and fully-out-of-bounds ROIs (the padded-row regime)."""
    from da_detect_tpu.ops.roi_align import roi_align_image

    rng = np.random.RandomState(7)
    feats = rng.randn(16, 16, 4).astype(np.float32)
    rois = np.array([
        [5.0, 5.0, 5.0, 5.0],        # zero-size
        [-40.0, -40.0, -30.0, -30.0],  # fully out of bounds
        [0.0, 0.0, 63.9, 63.9],      # full image
    ], np.float32)
    rois_t = torch.from_numpy(
        np.concatenate([np.zeros((len(rois), 1), np.float32), rois], 1))
    feats_nchw = np.ascontiguousarray(feats.transpose(2, 0, 1)[None])
    want = ref_kernel(torch.from_numpy(feats_nchw), rois_t, 0.25, 7, 7,
                      0).numpy()
    got = np.asarray(roi_align_image(jnp.asarray(feats), jnp.asarray(rois),
                                     spatial_scale=0.25, output_size=7,
                                     sampling_ratio=0)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
