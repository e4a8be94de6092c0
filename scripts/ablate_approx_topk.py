"""ADVICE item: measure the accuracy cost of TPU.APPROX_TOPK (default True).

approx_max_k only engages on big axes (>16x the target k): the FPN per-level
pre-NMS selection (~200k candidates/level at 800-class canvases), the
batch-wide FPN train top-k, and the balanced sampler's random-key threshold
over ~270k anchors. The tiny sanity shapes never reach those guards, so this
ablation trains source-only R-50-FPN (GN, from scratch) at a production
canvas on synthetic data — where every approx path is live — with
APPROX_TOPK on vs off, and compares AP50 on the held-out domain.

Run ON the TPU: python scripts/ablate_approx_topk.py [--iters 400]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--images", type=int, default=16)
    args = ap.parse_args()

    from da_detect_tpu.utils.env import setup_environment
    setup_environment()
    import jax
    from da_detect_tpu.tools.sanity_check import build_synthetic, train_and_eval
    from da_detect_tpu.config import get_cfg
    from da_detect_tpu.utils.logging_utils import setup_logger

    root = tempfile.mkdtemp(prefix="approx_abl_")
    build_synthetic(root, args.images, seed=3)
    os.environ["DA_DETECT_DATA_DIR"] = root
    logger = setup_logger("da_detect_tpu", None, jax.process_index())

    results = {}
    for approx in (True, False):
        cfg = get_cfg()
        cfg.merge_from_file("configs/e2e_faster_rcnn_R_50_FPN_1x.yaml")
        cfg.TPU.APPROX_TOPK = approx
        cfg.TPU.IMAGE_SHAPE = (800, 1344)
        cfg.TPU.MAX_GT_BOXES = 10
        cfg.MODEL.BACKBONE.USE_GN = True
        cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT = 0
        cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 3
        cfg.INPUT.TO_BGR255 = False
        cfg.INPUT.PIXEL_MEAN = (0.485, 0.456, 0.406)
        cfg.INPUT.PIXEL_STD = (0.229, 0.224, 0.225)
        cfg.INPUT.MIN_SIZE_TRAIN = (800,)
        cfg.INPUT.MAX_SIZE_TRAIN = 1333
        cfg.INPUT.MIN_SIZE_TEST = 800
        cfg.INPUT.MAX_SIZE_TEST = 1333
        cfg.DATASETS.TRAIN = ("sanity_clean_cocostyle",)
        cfg.DATASETS.TEST = ("sanity_clean_cocostyle",)
        cfg.SOLVER.IMS_PER_BATCH = 2
        cfg.SOLVER.BASE_LR = 0.005
        cfg.SOLVER.WARMUP_ITERS = 100
        cfg.SOLVER.WARMUP_FACTOR = 0.1
        cfg.SOLVER.MAX_ITER = args.iters
        cfg.TEST.IMS_PER_BATCH = 2
        cfg.TEST.DETECTIONS_PER_IMG = 10
        ap50, _ = train_and_eval(cfg, False, args.iters, logger,
                                 test_dataset="sanity_clean_cocostyle")
        results["approx_on" if approx else "approx_off"] = round(ap50, 4)
        print(f"APPROX_TOPK={approx}: AP50={ap50:.4f}", flush=True)
    results["delta"] = round(results["approx_on"] - results["approx_off"], 4)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
