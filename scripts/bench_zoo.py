"""Inference throughput across the model-family zoo on the attached TPU.

Builds each family from its reference config yaml (random weights — this
measures compute, not accuracy), jits the eval forward at the config's test
resolution, and reports ms/img. Demonstrates every family *runs* on TPU, not
just builds.

Run ON the TPU: python scripts/bench_zoo.py [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (label, config yaml, canvas override or None, with_masks)
FAMILIES = [
    ("faster_rcnn_R50_C4", "configs/e2e_faster_rcnn_R_50_C4_1x.yaml",
     (608, 1216), False),
    ("faster_rcnn_R50_FPN", "configs/e2e_faster_rcnn_R_50_FPN_1x.yaml",
     (800, 1344), False),
    ("faster_rcnn_X101_FPN", "configs/e2e_faster_rcnn_X_101_32x8d_FPN_1x.yaml",
     (800, 1344), False),
    ("mask_rcnn_R50_FPN", "configs/e2e_mask_rcnn_R_50_FPN_1x.yaml",
     (800, 1344), True),
    ("retinanet_R50_FPN", "configs/retinanet/retinanet_R-50-FPN_1x.yaml",
     (800, 1344), False),
    ("faster_rcnn_fbnet", "configs/e2e_faster_rcnn_fbnet.yaml",
     (608, 608), False),
]


def bench_family(label, yaml_path, canvas, with_masks, iters):
    import jax
    import __graft_entry__ as g
    from da_detect_tpu.config import get_cfg
    from da_detect_tpu.models import build_detection_model

    cfg = get_cfg()
    cfg.merge_from_file(yaml_path)
    if canvas:
        cfg.TPU.IMAGE_SHAPE = canvas
    model = build_detection_model(cfg)
    batch, _ = g._batch(cfg, 1)
    kwargs = {"with_masks": True} if with_masks else {}
    # init must trace the same path as the bench forward, or the mask
    # head's params never get created
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, **kwargs)
    fwd = jax.jit(lambda v, b: model.apply(v, b, **kwargs))
    def fetch(out):
        # honest barrier: fetch a scalar (see TROUBLESHOOTING.md).
        # Detections is a NamedTuple; the mask path returns (Detections,
        # probs) — a plain tuple whose first element has .scores
        dets = out if hasattr(out, "scores") else out[0]
        return float(dets.scores[0, 0])

    fetch(fwd(variables, batch))
    for _ in range(3):
        out = fwd(variables, batch)
    fetch(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, batch)
    fetch(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:24s} {canvas[0]}x{canvas[1]}  {dt * 1e3:7.1f} ms/img  "
          f"{1 / dt:6.1f} FPS", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    from da_detect_tpu.utils.env import setup_environment
    setup_environment()
    for label, path, canvas, masks in FAMILIES:
        if args.only and args.only not in label:
            continue
        try:
            bench_family(label, path, canvas, masks, args.iters)
        except Exception as e:  # noqa: BLE001
            print(f"{label:24s} FAILED: {str(e).splitlines()[0][:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
