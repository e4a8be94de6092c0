"""Native C++ host kernels vs the jax device formulations (the reference's
csrc/cpu-as-oracle strategy, inverted: here the native build is *also* under
test against the numpy oracles)."""

import jax.numpy as jnp
import numpy as np
import pytest

from da_detect_tpu import native
from da_detect_tpu.ops.nms import nms_mask
from da_detect_tpu.ops.roi_align import roi_align_image
from tests.test_nms import make_cluster_boxes, np_greedy_nms
from tests.test_roi_align import make_case, np_roi_align

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_native_nms_matches_device_nms():
    boxes, scores = make_cluster_boxes(500, 7)
    want = np_greedy_nms(boxes, scores, 0.5)
    native_keep = native.nms(boxes, scores, 0.5)
    np.testing.assert_array_equal(native_keep, want)
    device_keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                      jnp.ones(len(boxes), bool), 0.5))
    np.testing.assert_array_equal(device_keep, native_keep)


def test_native_per_class_nms():
    boxes, scores = make_cluster_boxes(200, 8)
    labels = np.random.RandomState(0).randint(1, 4, len(boxes)).astype(np.int32)
    keep = native.nms_per_class(boxes, scores, labels, 0.5)
    # equals running plain NMS independently per class
    for c in (1, 2, 3):
        sel = labels == c
        sub = np_greedy_nms(boxes[sel], scores[sel], 0.5)
        np.testing.assert_array_equal(keep[sel], sub)


def test_native_roi_align_matches_device():
    feat, rois = make_case(21, h=30, w=44, c=8)
    for ratio in (0, 2):
        want = np_roi_align(feat, rois, 1.0 / 16, 7, ratio)
        got_native = native.roi_align(feat, rois, 1.0 / 16, 7, ratio)
        np.testing.assert_allclose(got_native, want, rtol=1e-4, atol=1e-5)
        got_dev = np.asarray(roi_align_image(
            jnp.asarray(feat), jnp.asarray(rois), spatial_scale=1.0 / 16,
            output_size=7, sampling_ratio=ratio))
        np.testing.assert_allclose(got_dev, got_native, rtol=1e-3, atol=1e-4)


def test_native_prep_matches_numpy_path():
    """Fused resize+normalize+pad vs the cv2+numpy chain."""
    import cv2
    from da_detect_tpu.data.transforms import (apply_geometry,
                                               normalize_and_pad)
    rng = np.random.RandomState(5)
    img = rng.randint(0, 255, (60, 90, 3), dtype=np.uint8)
    mean = (102.9801, 115.9465, 122.7717)
    std = (1.0, 1.0, 1.0)
    for hflip in (False, True):
        ref_img, _, (rh, rw) = apply_geometry(
            img, np.zeros((0, 4), np.float32), min_size=40, max_size=70,
            hflip=hflip)
        want = normalize_and_pad(ref_img, (64, 96), mean, True, std)
        got = native.prep_image(img, (64, 96), (rh, rw), mean, std, True,
                                hflip)
        assert got.shape == want.shape
        # bilinear implementations differ at border taps; interior matches
        err = np.abs(got[1:rh - 1, 1:rw - 1] - want[1:rh - 1, 1:rw - 1])
        assert np.median(err) < 1.0, float(np.median(err))
        # padding region exactly zero
        np.testing.assert_array_equal(got[rh:], 0.0)
        np.testing.assert_array_equal(got[:, rw:], 0.0)
    # RGB/unit-scale convention too
    got = native.prep_image(img, (64, 96), (60, 90),
                            (0.485, 0.456, 0.406), (0.229, 0.224, 0.225),
                            False, False)
    manual = (img[..., ::-1].astype(np.float32) / 255.0
              - np.asarray((0.485, 0.456, 0.406), np.float32)) / np.asarray(
                  (0.229, 0.224, 0.225), np.float32)
    np.testing.assert_allclose(got[:60, :90], manual, rtol=1e-4, atol=1e-4)


def test_native_prep_rejects_undersized_canvas():
    """Resize target larger than the canvas must raise (the numpy path
    raises a broadcast error; the C kernel would write out of bounds)."""
    import pytest
    img = np.zeros((100, 120, 3), np.uint8)
    with pytest.raises(ValueError, match="exceeds canvas"):
        native.prep_image(img, (64, 96), (100, 120), (0, 0, 0), (1, 1, 1))
