"""Source-only train-step throughput for the classic zoo configs on one v5e,
mirroring the reference MODEL_ZOO train columns (8xV100, 16 img/batch):
Faster R-CNN R-50-FPN 0.3530 s/iter = 5.66 img/s/GPU; R-50-C4 0.4036 s/iter
= 4.96 img/s/GPU (2 im/GPU); Mask R-CNN R-50-FPN 0.4536 s/iter = 4.41.

Run ON the TPU: python scripts/bench_train_zoo.py [--iters 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (label, yaml, canvas, per-step images, reference img/s/GPU)
CASES = [
    ("faster_rcnn_R50_C4", "configs/e2e_faster_rcnn_R_50_C4_1x.yaml",
     (608, 1216), 2, 4.96),
    ("faster_rcnn_R50_FPN", "configs/e2e_faster_rcnn_R_50_FPN_1x.yaml",
     (800, 1344), 2, 5.66),
    ("mask_rcnn_R50_FPN", "configs/e2e_mask_rcnn_R_50_FPN_1x.yaml",
     (800, 1344), 2, 4.41),
    # 0.4591 s/iter at 2 im/GPU (MODEL_ZOO.md:23)
    ("faster_rcnn_R101_FPN", "configs/e2e_faster_rcnn_R_101_FPN_1x.yaml",
     (800, 1344), 2, 4.36),
    # 0.7007 s/iter at 2 im/GPU (MODEL_ZOO.md:24)
    ("faster_rcnn_X101_FPN", "configs/e2e_faster_rcnn_X_101_32x8d_FPN_1x.yaml",
     (800, 1344), 2, 2.85),
    # 0.3771 s/iter at 2 im/GPU (MODEL_ZOO.md:34)
    ("keypoint_rcnn_R50_FPN", "configs/e2e_keypoint_rcnn_R_50_FPN_1x.yaml",
     (800, 1344), 2, 5.30),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from da_detect_tpu.utils.env import setup_environment
    setup_environment()
    import jax
    import __graft_entry__ as g
    from da_detect_tpu.config import get_cfg
    from da_detect_tpu.engine.trainer import create_train_state, make_train_step
    from da_detect_tpu.models import build_detection_model

    for label, path, canvas, bsz, ref in CASES:
        cfg = get_cfg()
        cfg.merge_from_file(path)
        cfg.TPU.IMAGE_SHAPE = canvas
        cfg.TPU.MAX_GT_BOXES = 64
        cfg.SOLVER.IMS_PER_BATCH = bsz
        model = build_detection_model(cfg)
        batch, targets = g._batch(cfg, bsz)
        if cfg.MODEL.MASK_ON:
            import jax.numpy as jnp
            import numpy as np
            m = cfg.MODEL.ROI_MASK_HEAD.RESOLUTION * 2
            gshape = targets.boxes.shape[:-1]
            targets = targets.replace(masks=jnp.asarray(
                (np.random.RandomState(0).rand(*gshape, m, m) > 0.5)
                .astype(np.float32)))
        if cfg.MODEL.KEYPOINT_ON:
            import jax.numpy as jnp
            # 17 COCO keypoints at each GT box center, all visible
            ctr = (targets.boxes[..., :2] + targets.boxes[..., 2:]) / 2
            kps = jnp.concatenate(
                [jnp.tile(ctr[:, :, None, :], (1, 1, 17, 1)),
                 jnp.ones(targets.boxes.shape[:2] + (17, 1))], axis=-1)
            targets = targets.replace(keypoints=kps)
        sample = (batch, targets)
        state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                       sample, "multistep")
        step = make_train_step(model, tx)
        state, m = step(state, *sample)
        float(m["loss_total"])
        for _ in range(3):
            state, m = step(state, *sample)
        float(m["loss_total"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, m = step(state, *sample)
        float(m["loss_total"])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{label:22s} {canvas[0]}x{canvas[1]} b={bsz}  "
              f"{dt * 1e3:7.1f} ms/step  {bsz / dt:6.1f} img/s  "
              f"(ref {ref} img/s/V100)", flush=True)
        del state, m, step


if __name__ == "__main__":
    main()
