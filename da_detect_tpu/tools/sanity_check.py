"""End-to-end self-test: fabricate a synthetic aligned-triple dataset, train
the full triplet-DA model from scratch for a few hundred steps, and verify
AP50 rises — proves the whole stack (data -> RPN -> ROI -> DA -> eval) learns
on the current hardware without needing real datasets or pretrained weights.

    python -m da_detect_tpu.tools.sanity_check [--iters 800] [--da]

Note: uses a GroupNorm backbone — FrozenBN is an identity affine at init
(it exists to hold pretrained folded statistics), so training *from scratch*
with it diverges, in the reference exactly as here.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time


def build_synthetic(root: str, n_images: int, seed: int):
    """Noise images with solid rectangles at the GT boxes; foggy/rainy are
    pixel-aligned degradations (see tests/data_factory for the test twin)."""
    import numpy as np
    try:
        import cv2
    except ImportError as e:
        raise SystemExit("sanity_check needs cv2") from e

    rng = np.random.RandomState(seed)
    h, w = 120, 160
    dirs = {k: os.path.join(root, k) for k in ("clean", "foggy", "rainy")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        img = rng.randint(0, 60, (h, w, 3), dtype=np.uint8)
        for _ in range(int(rng.randint(1, 4))):
            bw, bh = (int(v) for v in rng.randint(15, 40, 2))
            x1 = int(rng.randint(0, w - bw - 1))
            y1 = int(rng.randint(0, h - bh - 1))
            lab = int(rng.randint(1, 3))
            color = (220, 40, 40) if lab == 1 else (40, 220, 40)
            img[y1:y1 + bh, x1:x1 + bw] = color
            annotations.append({
                "id": ann_id, "image_id": i + 1, "category_id": lab,
                "bbox": [x1, y1, bw, bh], "area": bw * bh, "iscrowd": 0,
                "segmentation": [[x1, y1, x1 + bw, y1, x1 + bw, y1 + bh,
                                  x1, y1 + bh]]})
            ann_id += 1
        fog = (img.astype(np.float32) * 0.55 + 110).clip(0, 255).astype(np.uint8)
        rain = img.copy()
        rain[:, ::7] = np.minimum(rain[:, ::7].astype(int) + 120, 255).astype(np.uint8)
        name = f"img_{i:04d}.png"
        for d, arr in ((dirs["clean"], img), (dirs["foggy"], fog),
                       (dirs["rainy"], rain)):
            cv2.imwrite(os.path.join(d, name), arr)
        images.append({"id": i + 1, "file_name": name, "height": h, "width": w})
    ann_path = os.path.join(root, "instances.json")
    with open(ann_path, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "car"},
                                  {"id": 2, "name": "person"}]}, f)
    cat = {f"sanity_{k}_cocostyle": {"img_dir": os.path.relpath(d, root),
                                     "ann_file": "instances.json"}
           for k, d in dirs.items()}
    with open(os.path.join(root, "catalog.json"), "w") as f:
        json.dump(cat, f)
    return root


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", type=int, default=800)
    p.add_argument("--images", type=int, default=16)
    p.add_argument("--da", action="store_true",
                   help="full triplet-DA path (default: source-only)")
    p.add_argument("--min-ap50", type=float, default=0.5)
    p.add_argument("--data-dir", default="")
    args = p.parse_args(argv)

    root = args.data_dir or tempfile.mkdtemp(prefix="dd_sanity_")
    build_synthetic(root, args.images, seed=3)
    os.environ["DA_DETECT_DATA_DIR"] = root

    import jax
    from ..config import get_cfg
    from ..data import make_data_loader, make_data_loader_da
    from ..engine.inference import inference
    from ..engine.trainer import create_train_state, do_train
    from ..models import build_detection_model
    from ..utils.env import setup_environment
    from ..utils.logging_utils import setup_logger

    setup_environment()
    logger = setup_logger("da_detect_tpu", None, jax.process_index())

    cfg = get_cfg()
    cfg.TPU.IMAGE_SHAPE = (128, 160)
    cfg.TPU.MAX_GT_BOXES = 10
    cfg.MODEL.DOMAIN_ADAPTATION_ON = bool(args.da)
    cfg.MODEL.BACKBONE.USE_GN = True
    cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT = 0
    cfg.INPUT.TO_BGR255 = False
    cfg.INPUT.PIXEL_MEAN = (0.485, 0.456, 0.406)
    cfg.INPUT.PIXEL_STD = (0.229, 0.224, 0.225)
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 3
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 600
    cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN = 128
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 600
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 128
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 64
    cfg.MODEL.DA_HEADS.DA_TRIPLET_INS_WEIGHT = 0.0
    cfg.INPUT.MIN_SIZE_TRAIN = (120,)
    cfg.INPUT.MAX_SIZE_TRAIN = 160
    cfg.INPUT.MIN_SIZE_TEST = 120
    cfg.INPUT.MAX_SIZE_TEST = 160
    cfg.DATASETS.TRAIN = ("sanity_clean_cocostyle",)
    cfg.DATASETS.SOURCE_TRAIN = ("sanity_clean_cocostyle",)
    cfg.DATASETS.TARGET_TRAIN = ("sanity_foggy_cocostyle",)
    cfg.DATASETS.TARGET_TRAIN_negative = ("sanity_rainy_cocostyle",)
    cfg.DATASETS.TEST = (("sanity_foggy_cocostyle" if args.da
                          else "sanity_clean_cocostyle"),)
    cfg.SOLVER.IMS_PER_BATCH = 2 if args.da else 4
    cfg.SOLVER.BASE_LR = 0.01
    cfg.SOLVER.WARMUP_ITERS = 100
    cfg.SOLVER.WARMUP_FACTOR = 0.1
    cfg.SOLVER.WARMUP_LR = 0.001
    cfg.SOLVER.MAX_ITER = args.iters
    cfg.TEST.IMS_PER_BATCH = 2
    cfg.TEST.DETECTIONS_PER_IMG = 10

    model = build_detection_model(cfg)
    if args.da:
        loader = make_data_loader_da(cfg, aligned=True, seed=0)
    else:
        loader, _ = make_data_loader(cfg, is_train=True, seed=0)
    it = iter(loader)
    sample = next(it)
    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0), sample,
                                   "cosine" if args.da else "multistep")

    def chained():
        yield sample
        yield from it

    t0 = time.perf_counter()
    state = do_train(cfg, model, state, tx, chained(), max_iter=args.iters,
                     log_period=max(args.iters // 4, 1))
    logger.info("%d iters in %.0fs", args.iters, time.perf_counter() - t0)

    tl, ds = make_data_loader(cfg, is_train=False,
                              dataset_names=cfg.DATASETS.TEST)
    res, _ = inference(model, {"params": state.params, "frozen": state.frozen},
                       tl, ds)
    ap50 = res["bbox"]["AP50"]
    verdict = "PASS" if ap50 >= args.min_ap50 else "FAIL"
    print(json.dumps({"sanity_check": verdict, "mode": "da" if args.da
                      else "source_only", "AP50": round(ap50, 4),
                      "threshold": args.min_ap50}))
    if verdict == "FAIL":
        raise SystemExit(1)


if __name__ == "__main__":
    main()
