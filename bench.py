"""Benchmark: triplet-DA train throughput on the flagship config.

Measures steady-state images/sec of the full jitted train step (R-50-C4,
608x1216 canvas, 256-ROI batch, bf16 compute, one (src, pos, neg) triple per
step = 3 images) on the attached TPU chip, against the reference anchor of
2.48 images/s/GPU (V100 Faster R-CNN R-50-C4 train, 0.4036 s/iter at
1 im/GPU — MODEL_ZOO.md:21; see BASELINE.md).

The measured step is the REFERENCE-EXACT WACV method: ALIGNMENT=True
(tools/train_net_triplet.py:118-179 / generalized_rcnn.py:104-114 there),
i.e. the aligned instance-triplet re-pools the positive slice's proposals
from all three domains' features each step. The cheaper unaligned variant
(~80 img/s) and the SHARE_POSITIVE_POOL fast path (~53 img/s) are reported
in PERFORMANCE.md.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_IMG_PER_SEC = 2.48


def main():
    import jax
    from da_detect_tpu.utils.env import setup_environment
    setup_environment()
    from __graft_entry__ import _batch, _flagship_cfg
    from da_detect_tpu.engine.trainer import create_train_state, make_train_step
    from da_detect_tpu.models import build_detection_model

    cfg = _flagship_cfg(canvas=(608, 1216),
                        train_tops=(12000, 2000), test_tops=(6000, 1000))
    cfg.TPU.MAX_GT_BOXES = 64
    cfg.SOLVER.IMS_PER_BATCH = 2  # k=1 triple per step (the parity config)
    model = build_detection_model(cfg)

    k = 1
    sample = []
    for d, src in ((0, True), (1, False), (2, False)):
        b, t = _batch(cfg, k, seed=d, is_source=src)
        sample += [b, t]
    sample = tuple(sample)

    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0), sample,
                                   "cosine")
    step = make_train_step(model, tx, aligned=True)

    # compile + warmup. NOTE: block_until_ready over the axon relay acks
    # early; a host fetch of a result scalar is the only honest barrier.
    state, metrics = step(state, *sample)
    float(metrics["loss_total"])
    for _ in range(3):
        state, metrics = step(state, *sample)
    float(metrics["loss_total"])

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, *sample)
    final_loss = float(metrics["loss_total"])  # barrier inside timed region
    dt = (time.perf_counter() - t0) / iters

    images_per_sec = 3 * k / dt
    assert np.isfinite(final_loss)
    print(json.dumps({
        "metric": "da_triplet_aligned_train_images_per_sec",
        "value": round(images_per_sec, 3),
        "unit": "images/s/chip",
        "vs_baseline": round(images_per_sec / BASELINE_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
