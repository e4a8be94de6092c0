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


def build_synthetic(root: str, n_images: int, seed: int,
                    fog=(0.55, 110.0), hw=(120, 160), texture="noise",
                    invert: bool = False):
    """Noise images with solid rectangles at the GT boxes; foggy/rainy are
    pixel-aligned degradations (see tests/data_factory for the test twin).
    ``fog`` = (contrast, offset) of the target-domain degradation; with
    ``invert`` the degradation is applied to the CHANNEL-INVERTED image —
    a structural shift. The ablation gate needs ``invert``: a purely affine
    fog (a*img + b) rescales box-vs-background contrast uniformly, which the
    GN-normalized from-scratch backbone largely absorbs (measured: a
    source-only model still scores AP50 0.61 on an a=0.25 fog), leaving the
    DA-vs-source gap thinner than trajectory chaos. Inversion flips the
    bright-boxes-on-dark-noise polarity (each class keeps a distinct
    signature — no class swap), which a clean-trained detector cannot
    normalize away but pixel-aligned adversarial DA can adapt to.
    ``hw`` sets the on-disk image size (bench.py
    uses cityscapes-sized 1024x2048 so the host decode+prep cost is real).
    ``texture="natural"`` makes the background spatially correlated (coarse
    field upsampled + mild fine noise) so the PNGs compress like real
    photographs (~1 byte/px, matching real Cityscapes leftImg8bit files)
    instead of raw iid noise (~2.4 byte/px, which made the bench decode
    pathologically slow); the training gates keep the default texture."""
    import numpy as np
    try:
        import cv2
    except ImportError as e:
        raise SystemExit("sanity_check needs cv2") from e

    rng = np.random.RandomState(seed)
    h, w = hw
    dirs = {k: os.path.join(root, k) for k in ("clean", "foggy", "rainy")}
    fog_a, fog_b = fog
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        if texture == "natural":
            coarse = rng.randint(0, 60, (h // 8 + 1, w // 8 + 1, 3),
                                 dtype=np.uint8)
            img = cv2.resize(coarse, (w, h), interpolation=cv2.INTER_LINEAR)
            img = (img.astype(np.int16)
                   + rng.randint(-3, 4, (h, w, 3))).clip(0, 59).astype(np.uint8)
        else:
            img = rng.randint(0, 60, (h, w, 3), dtype=np.uint8)
        for _ in range(int(rng.randint(1, 4))):
            # box size scales with the canvas (15-40 px at the 120x160 base)
            bw, bh = (int(v) for v in rng.randint(h // 8, h // 3, 2))
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
        base = (255.0 - img.astype(np.float32) if invert
                else img.astype(np.float32))
        fog = (base * fog_a + fog_b
               + rng.randn(h, w, 3) * 8).clip(0, 255).astype(np.uint8)
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


def sanity_cfg(da: bool, iters: int):
    from ..config import get_cfg

    cfg = get_cfg()
    cfg.TPU.IMAGE_SHAPE = (128, 160)
    cfg.TPU.MAX_GT_BOXES = 10
    cfg.MODEL.DOMAIN_ADAPTATION_ON = bool(da)
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
    cfg.DATASETS.TEST = (("sanity_foggy_cocostyle" if da
                          else "sanity_clean_cocostyle"),)
    cfg.SOLVER.IMS_PER_BATCH = 2 if da else 4
    cfg.SOLVER.BASE_LR = 0.01
    cfg.SOLVER.WARMUP_ITERS = 100
    cfg.SOLVER.WARMUP_FACTOR = 0.1
    cfg.SOLVER.WARMUP_LR = 0.001
    cfg.SOLVER.MAX_ITER = iters
    cfg.TEST.IMS_PER_BATCH = 2
    cfg.TEST.DETECTIONS_PER_IMG = 10
    return cfg


def train_and_eval(cfg, da: bool, iters: int, logger, seed: int = 0,
                   test_dataset: str | None = None):
    """Train from scratch per ``cfg`` and return (AP50 on the test set,
    final TrainState)."""
    import jax
    from ..data import make_data_loader, make_data_loader_da
    from ..engine.inference import inference
    from ..engine.trainer import create_train_state, do_train
    from ..models import build_detection_model

    model = build_detection_model(cfg)
    # single-transfer transport (data/packing.py): on the relayed bench chip
    # each device_put costs a ~23 ms round-trip, so ship each step's whole
    # input pytree as one buffer when host-feeding a single device
    packed = (bool(cfg.TPU.PACKED_TRANSPORT) and jax.device_count() == 1
              and jax.process_count() == 1)
    if da:
        loader = make_data_loader_da(cfg, aligned=True, seed=seed,
                                     packed=packed)
    else:
        loader, _ = make_data_loader(cfg, is_train=True, seed=seed,
                                     packed=packed)
    it = iter(loader)
    sample = next(it)
    if packed:
        import numpy as np
        buf, packer = sample
        init_args = packer.unpack_np(np.asarray(jax.device_get(buf)))
    else:
        init_args = sample
    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(seed),
                                   init_args, "cosine" if da else "multistep")

    def chained():
        yield sample
        yield from it

    t0 = time.perf_counter()
    state = do_train(cfg, model, state, tx, chained(), max_iter=iters,
                     log_period=max(iters // 4, 1), aligned=da, packed=packed)
    logger.info("%d iters in %.0fs", iters, time.perf_counter() - t0)
    loader.close()

    tl, ds = make_data_loader(
        cfg, is_train=False,
        dataset_names=(test_dataset,) if test_dataset else cfg.DATASETS.TEST)
    res, _ = inference(model, {"params": state.params, "frozen": state.frozen},
                       tl, ds)
    return res["bbox"]["AP50"], state


def run_ablation(args, logger):
    """The DA-direction gate: with a strong domain shift, triplet-DA training
    must beat source-only training on the *target* domain (the synthetic
    proxy of the reference's 23.41 -> 42.34 ladder, README.md:153-159).

    The target domain is channel-INVERTED (build_synthetic ``invert``) so
    the shift is structural: measured at 200 iters, source-only scores AP50
    0.013 on the inverted target while triplet-DA recovers 0.405.

    The adaptive image margin is REPORTED but not gated: its growth trigger
    is an exact ``loss == 0.0`` step (reference loss.py:189), which these
    synthetic few-hundred-step runs don't reliably produce — the mechanism
    is pinned deterministically in tests/test_da_margin.py instead
    (zero-loss state threaded through the real DA module grows the margin
    by lr)."""
    results = {}
    for da in (False, True):
        cfg = sanity_cfg(da, args.iters)
        cfg.DATASETS.TEST = ("sanity_foggy_cocostyle",)
        # headroom so growth CAN trigger (int(margin) != int(max_margin))
        cfg.MODEL.DA_HEADS.TRIPLET_MAX_MARGIN = 3.0
        # CPU-affordable arms: the gate runs inside the CPU test suite
        # (tests/test_end_to_end.py), where the default C4 head is ~1.1
        # TFLOP/step (res5 over 256 14x14 ROIs = 98% of it, measured via
        # cost_analysis) — ~20 s/step on one core. Pooling at 7 and 16
        # ROIs/img cuts the step ~16x; the DA-direction signal is about the
        # adversarial heads, not ROI capacity, and survives intact.
        cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
        cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
        ap50, state = train_and_eval(cfg, da, args.iters, logger,
                                     test_dataset="sanity_foggy_cocostyle")
        results["da" if da else "source_only"] = round(ap50, 4)
        if da:
            results["margin_img"] = round(float(state.da_state.margin_img), 4)
    gap = results["da"] - results["source_only"]
    ok = gap >= args.min_gap
    print(json.dumps(dict({"sanity_check": "PASS" if ok else "FAIL",
                           "mode": "ablation",
                           "gap": round(gap, 4),
                           "min_gap": args.min_gap}, **results)))
    if not ok:
        raise SystemExit(1)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", type=int, default=800)
    p.add_argument("--images", type=int, default=16)
    p.add_argument("--da", action="store_true",
                   help="full triplet-DA path (default: source-only)")
    p.add_argument("--ablation", action="store_true",
                   help="DA-direction gate: train source-only AND triplet-DA "
                        "under a strong domain shift; DA must win on the "
                        "target domain and the adaptive margin must grow")
    p.add_argument("--min-ap50", type=float, default=0.5)
    p.add_argument("--min-gap", type=float, default=0.05)
    p.add_argument("--data-dir", default="")
    args = p.parse_args(argv)

    root = args.data_dir or tempfile.mkdtemp(prefix="dd_sanity_")
    # ablation: structural inverted shift (see build_synthetic docstring);
    # plain --da keeps the milder affine fog
    build_synthetic(root, args.images, seed=3,
                    fog=(0.8, 10.0) if args.ablation else (0.55, 110.0),
                    invert=args.ablation)
    os.environ["DA_DETECT_DATA_DIR"] = root

    import jax
    from ..utils.env import setup_environment
    from ..utils.logging_utils import setup_logger

    setup_environment()
    logger = setup_logger("da_detect_tpu", None, jax.process_index())

    if args.ablation:
        return run_ablation(args, logger)

    cfg = sanity_cfg(args.da, args.iters)
    ap50, _ = train_and_eval(cfg, args.da, args.iters, logger)
    verdict = "PASS" if ap50 >= args.min_ap50 else "FAIL"
    print(json.dumps({"sanity_check": verdict, "mode": "da" if args.da
                      else "source_only", "AP50": round(ap50, 4),
                      "threshold": args.min_ap50}))
    if verdict == "FAIL":
        raise SystemExit(1)


if __name__ == "__main__":
    main()
