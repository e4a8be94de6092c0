"""Native (C++) host components, loaded via ctypes.

The reference's native layer is CUDA/C++ detection kernels
(maskrcnn_benchmark/csrc). On TPU the *device* kernels are XLA/Pallas
programs (ops/), but the host-side runtime keeps native counterparts:

* ``nms_cpu`` / ``nms_per_class_cpu`` — exact greedy NMS used as the oracle
  for the device fixpoint NMS and for host-side TTA / multi-pass merging
* ``roi_align_cpu`` — the forward oracle for the MXU matmul formulation

Compiled on first use with g++ (no pybind11 dependency; plain C ABI).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_ROOT = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LOCK = threading.Lock()
_LIB = None


def _build_and_load():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        src_dir = os.path.abspath(os.path.join(_ROOT, "src"))
        build_dir = os.path.abspath(os.path.join(_ROOT, "build"))
        os.makedirs(build_dir, exist_ok=True)
        so = os.path.join(build_dir, "libdadetect_native.so")
        srcs = [os.path.join(src_dir, f) for f in sorted(os.listdir(src_dir))
                if f.endswith(".cc")]
        newest_src = max(os.path.getmtime(s) for s in srcs)
        if not os.path.exists(so) or os.path.getmtime(so) < newest_src:
            cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                   "-std=c++17", "-o", so] + srcs
            subprocess.run(cmd, check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.nms_cpu.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_float, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.nms_per_class_cpu.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_float,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
        lib.roi_align_cpu.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_float, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.prep_image.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int]
        _LIB = lib
        return lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def nms(boxes: np.ndarray, scores: np.ndarray, thresh: float,
        legacy_plus1: bool = True) -> np.ndarray:
    """Returns keep mask [N] bool."""
    lib = _build_and_load()
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    keep = np.zeros(len(boxes), np.uint8)
    lib.nms_cpu(_fptr(boxes), _fptr(scores), len(boxes), thresh,
                int(legacy_plus1),
                keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return keep.astype(bool)


def nms_per_class(boxes: np.ndarray, scores: np.ndarray, labels: np.ndarray,
                  thresh: float, legacy_plus1: bool = True) -> np.ndarray:
    lib = _build_and_load()
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    labels = np.ascontiguousarray(labels, np.int32)
    keep = np.zeros(len(boxes), np.uint8)
    lib.nms_per_class_cpu(
        _fptr(boxes), _fptr(scores),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(boxes),
        thresh, int(legacy_plus1),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return keep.astype(bool)


def roi_align(feat: np.ndarray, rois: np.ndarray, spatial_scale: float,
              output_size: int, sampling_ratio: int = 0) -> np.ndarray:
    """feat [H, W, C], rois [N, 4] -> [N, P, P, C] float32."""
    lib = _build_and_load()
    feat = np.ascontiguousarray(feat, np.float32)
    rois = np.ascontiguousarray(rois, np.float32)
    h, w, c = feat.shape
    n = len(rois)
    out = np.zeros((n, output_size, output_size, c), np.float32)
    lib.roi_align_cpu(_fptr(feat), h, w, c, _fptr(rois), n,
                      spatial_scale, output_size, sampling_ratio, _fptr(out))
    return out


def prep_image(src_bgr_u8: np.ndarray, canvas_hw, resized_hw, pixel_mean,
               pixel_std, to_bgr255: bool = True,
               hflip: bool = False) -> np.ndarray:
    """Fused resize+normalize+pad: uint8 BGR [sh, sw, 3] -> float32 canvas
    [ch, cw, 3] (one pass; replaces the cv2.resize -> normalize -> pad
    chain)."""
    lib = _build_and_load()
    src = np.ascontiguousarray(src_bgr_u8, np.uint8)
    ch, cw = canvas_hw
    rh, rw = resized_hw
    if rh > ch or rw > cw:
        # the numpy fallback raises a broadcast ValueError for this
        # misconfiguration; the C kernel would write out of bounds
        raise ValueError(
            f"resized image {rh}x{rw} exceeds canvas {ch}x{cw} "
            "(INPUT.MIN/MAX_SIZE inconsistent with TPU.IMAGE_SHAPE)")
    out = np.empty((ch, cw, 3), np.float32)
    mean = np.ascontiguousarray(pixel_mean, np.float32)
    std = np.ascontiguousarray(pixel_std, np.float32)
    lib.prep_image(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        src.shape[0], src.shape[1], _fptr(out), ch, cw, rh, rw,
        int(to_bgr255), _fptr(mean), _fptr(std), int(hflip))
    return out


def available() -> bool:
    try:
        _build_and_load()
        return True
    except Exception:
        return False
