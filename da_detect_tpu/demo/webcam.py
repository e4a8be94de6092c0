"""Webcam demo (reference demo/webcam.py)."""

from __future__ import annotations

import argparse

import cv2

from ..config import get_cfg
from .predictor import COCODemo


def main(argv=None):
    p = argparse.ArgumentParser(description="webcam detection demo")
    p.add_argument("--config-file", required=True)
    p.add_argument("--confidence-threshold", type=float, default=0.7)
    p.add_argument("--camera", type=int, default=0)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = p.parse_args(argv)

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    demo = COCODemo(cfg, confidence_threshold=args.confidence_threshold)
    cam = cv2.VideoCapture(args.camera)
    while True:
        ret, img = cam.read()
        if not ret:
            break
        composite = demo.run_on_opencv_image(img)
        cv2.imshow("DA-Detect TPU", composite)
        if cv2.waitKey(1) == 27:  # ESC
            break
    cv2.destroyAllWindows()


if __name__ == "__main__":
    main()
