"""Batch image-folder detection drawing (reference demo/draw_detection.py)."""

from __future__ import annotations

import argparse
import glob
import os

import cv2

from ..config import get_cfg
from .predictor import COCODemo


def main(argv=None):
    p = argparse.ArgumentParser(description="draw detections on a folder")
    p.add_argument("--config-file", required=True)
    p.add_argument("--input-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--confidence-threshold", type=float, default=0.7)
    p.add_argument("--weight", default="")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = p.parse_args(argv)

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    demo = COCODemo(cfg, confidence_threshold=args.confidence_threshold,
                    weight=args.weight or None)
    os.makedirs(args.output_dir, exist_ok=True)
    paths = sorted(sum((glob.glob(os.path.join(args.input_dir, e))
                        for e in ("*.png", "*.jpg", "*.jpeg")), []))
    for path in paths:
        img = cv2.imread(path)
        out = demo.run_on_opencv_image(img)
        dst = os.path.join(args.output_dir, os.path.basename(path))
        cv2.imwrite(dst, out)
        print(f"{path} -> {dst}")


if __name__ == "__main__":
    main()
