"""BASELINE config #5: X-101-32x8d FPN + DCN triplet-DA — train step and
TTA eval, measured on the attached chip.

The reference *advertises* this combination but cannot run it (dcn config
keys absent, deform ops unbound — SURVEY §7.4), so there is no reference
anchor; the rows land in PERFORMANCE.md as absolute numbers.

Run ON the TPU: python scripts/bench_x101_dcn.py [--iters 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

YAML = ("configs/da_faster_rcnn/"
        "e2e_triplet_da_faster_rcnn_X_101_32x8d_FPN_dcn_"
        "cityscapes_to_foggy_cityscapes.yaml")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--tta-images", type=int, default=4)
    ap.add_argument("--gather", default="four", choices=("four", "quad"),
                    help="TPU.DCN_GATHER lowering to benchmark")
    ap.add_argument("--train-only", action="store_true")
    args = ap.parse_args()

    from da_detect_tpu.utils.env import setup_environment
    setup_environment()
    import jax
    import __graft_entry__ as g
    from da_detect_tpu.config import get_cfg
    from da_detect_tpu.engine.trainer import create_train_state, make_train_step
    from da_detect_tpu.models import build_detection_model

    # ---- triplet-DA train step (ALIGNMENT=False per the yaml) ----
    cfg = get_cfg()
    cfg.merge_from_file(YAML)
    cfg.TPU.IMAGE_SHAPE = (608, 1216)   # MIN/MAX_SIZE_TRAIN 600/1200, /32
    cfg.TPU.MAX_GT_BOXES = 64
    cfg.SOLVER.IMS_PER_BATCH = 2        # k=1 triple
    # the tap-scanned DCN (layers/deform_conv.py) already checkpoints its
    # scan body, so the step fits WITHOUT remat (probed: no-remat 767 ms,
    # roi-only 768, backbone 932); keep roi remat as free headroom
    cfg.TPU.REMAT_ROI_HEAD = True
    cfg.TPU.DCN_GATHER = args.gather
    model = build_detection_model(cfg)
    sample = []
    for d, src in ((0, True), (1, False), (2, False)):
        b, t = g._batch(cfg, 1, seed=d, is_source=src)
        sample += [b, t]
    sample = tuple(sample)
    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0), sample,
                                   "cosine")
    # donate=False: with donation the SECOND step (donated device-resident
    # state) kills the TPU worker on this model — see PERFORMANCE.md note
    step = make_train_step(model, tx, aligned=False, donate=False)
    state, m = step(state, *sample)
    print("first step ok, loss", float(m["loss_total"]), flush=True)
    for _ in range(2):
        state, m = step(state, *sample)
    float(m["loss_total"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, m = step(state, *sample)
    float(m["loss_total"])
    dt = (time.perf_counter() - t0) / args.iters
    print(f"x101_dcn_da train (gather={args.gather}): {dt * 1e3:.1f} ms/step,"
          f" {3 / dt:.2f} img/s", flush=True)
    if args.train_only:
        return

    # ---- TTA eval (3 scales x flip + base x flip = 8 passes/img) ----
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests import data_factory as factory  # noqa: E402

    root = tempfile.mkdtemp(prefix="x101_tta_")
    dirs = factory.make_triplet_datasets(root, n_images=args.tta_images,
                                         h=512, w=1024)
    factory.register_tiny_catalog(dirs)
    ev = cfg.clone()
    ev.defrost()
    ev.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 3
    ev.DATASETS.TEST = ("tiny_foggy_cocostyle",)
    ev.TEST.IMS_PER_BATCH = 1
    ev.TEST.DETECTIONS_PER_IMG = 100
    model_ev = build_detection_model(ev)
    from da_detect_tpu.engine.bbox_aug import compute_on_dataset_aug
    # init fresh eval variables at one of the TTA shapes
    from da_detect_tpu.data import make_data_loader
    loader, _ = make_data_loader(ev, is_train=False,
                                 dataset_names=ev.DATASETS.TEST)
    batch, _ = next(iter(loader))
    variables = model_ev.init({"params": jax.random.PRNGKey(0)}, batch)
    for round_i in range(2):  # round 0 compiles all 8 pass programs
        t0 = time.perf_counter()
        preds, _ = compute_on_dataset_aug(model_ev, variables, ev,
                                          ev.DATASETS.TEST[0])
        dt = time.perf_counter() - t0
        tag = "compile+run" if round_i == 0 else "steady"
        print(f"x101_dcn TTA eval ({tag}): {dt / args.tta_images:.2f} s/img "
              f"over {args.tta_images} images, 8 passes each", flush=True)


if __name__ == "__main__":
    main()
