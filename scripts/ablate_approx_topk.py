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

    def make_cfg(approx):
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
        return cfg

    results = {}
    # Arm 1/2: end-to-end training runs with approx on vs off. AP50 is the
    # headline; strict AP is also recorded but note the two runs differ in
    # sampling RNG consumption, so strict-AP deltas here fold in run noise.
    for approx in (True, False):
        cfg = make_cfg(approx)
        ap50, state = train_and_eval(cfg, False, args.iters, logger,
                                     test_dataset="sanity_clean_cocostyle")
        key = "approx_on" if approx else "approx_off"
        results[key + "_ap50"] = round(ap50, 4)
        print(f"APPROX_TOPK={approx}: AP50={ap50:.4f}", flush=True)
        if not approx:
            exact_state = state

    # Eval-isolated comparison (deterministic, no training confound): the
    # SAME exact-trained weights evaluated with the approx vs exact
    # inference path.
    from da_detect_tpu.data import make_data_loader
    from da_detect_tpu.engine.inference import inference
    from da_detect_tpu.models import build_detection_model
    variables = {"params": exact_state.params, "frozen": exact_state.frozen}
    for approx in (True, False):
        cfg = make_cfg(approx)
        model = build_detection_model(cfg)
        tl, ds = make_data_loader(cfg, is_train=False,
                                  dataset_names=("sanity_clean_cocostyle",))
        res, _ = inference(model, variables, tl, ds)
        key = "eval_only_approx_on" if approx else "eval_only_approx_off"
        results[key + "_ap"] = round(res["bbox"]["AP"], 4)
        results[key + "_ap50"] = round(res["bbox"]["AP50"], 4)
        print(f"eval-only APPROX_TOPK={approx}: AP={res['bbox']['AP']:.4f} "
              f"AP50={res['bbox']['AP50']:.4f}", flush=True)
    results["eval_only_ap_delta"] = round(
        results["eval_only_approx_on_ap"] - results["eval_only_approx_off_ap"], 4)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
