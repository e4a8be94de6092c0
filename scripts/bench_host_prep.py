"""Host input-pipeline microbench: fused native image prep vs cv2 chain.

Produces the PERFORMANCE.md "Host input pipeline" table: per-image cost of
the single fused C++ pass (native/src/image_prep.cc: bilinear resize +
Caffe2 BGR255 normalize + canvas pad, one traversal) against the
reference-style chain (cv2.resize -> BGR/float cast -> mean subtract ->
canvas pad; reference data/transforms/transforms.py:17-98 equivalent).

Run on the host CPU (no device needed):
    python scripts/bench_host_prep.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from da_detect_tpu import native  # noqa: E402


def cv2_chain(img_u8, out_h, out_w, canvas_h, canvas_w, mean):
    import cv2

    r = cv2.resize(img_u8, (out_w, out_h), interpolation=cv2.INTER_LINEAR)
    r = r[:, :, ::-1].astype(np.float32)  # RGB->BGR; x255 scale rides uint8
    r = r - mean
    canvas = np.zeros((canvas_h, canvas_w, 3), np.float32)
    canvas[:out_h, :out_w] = r
    return canvas


def main():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (1024, 2048, 3), np.uint8)  # cityscapes-sized
    mean = np.array([102.9801, 115.9465, 122.7717], np.float32)
    std = np.ones(3, np.float32)

    cases = [
        ("fused native pass",
         lambda: native.prep_image(img, (608, 1216), (600, 1200), mean, std,
                                   True)),
        ("cv2 + numpy chain",
         lambda: cv2_chain(img, 600, 1200, 608, 1216, mean)),
    ]
    for label, fn in cases:
        fn()  # warmup (first native call builds/loads the library)
        n = 30
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{label}: {dt:.1f} ms/img")


if __name__ == "__main__":
    main()
