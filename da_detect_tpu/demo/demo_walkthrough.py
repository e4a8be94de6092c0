# %% [markdown]
# # DA-Detect TPU demo
#
# The runnable counterpart of the reference's `demo/Mask_R-CNN_demo.ipynb`
# (a jupytext percent-format script: open it as a notebook with
# `jupytext --to ipynb demo_walkthrough.py`, or just `python -m
# da_detect_tpu.demo.demo_walkthrough [image.png ...]`). It mirrors the
# notebook's flow: build a config, construct `COCODemo`, run prediction +
# overlay on an image — the demo stack handles pre-processing, the jitted
# forward, and post-processing.
#
# Reference: demo/Mask_R-CNN_demo.ipynb + demo/predictor.py there.

# %%
from __future__ import annotations

import sys

import numpy as np

# %% [markdown]
# Build the model configuration. Any zoo YAML works (the reference
# notebook uses e2e_mask_rcnn_R_50_FPN_1x.yaml and overrides the device);
# with no checkpoint available this walkthrough keeps a small random-init
# config so it runs anywhere. Point `--config-file`-style edits at your
# own YAML + `MODEL.WEIGHT` for real predictions.

# %%
def build_demo(confidence_threshold: float = 0.5, masks: bool = False):
    from ..config import get_cfg
    from .predictor import COCODemo

    cfg = get_cfg()
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 81  # COCO classes
    cfg.MODEL.MASK_ON = masks
    cfg.TPU.IMAGE_SHAPE = (480, 640)
    cfg.INPUT.MIN_SIZE_TEST = 448
    cfg.INPUT.MAX_SIZE_TEST = 640
    # cfg.MODEL.WEIGHT = "path/to/checkpoint.npz"   # <- your weights
    return COCODemo(cfg, confidence_threshold=confidence_threshold)


# %% [markdown]
# Load an image as BGR uint8 (the Caffe2/cv2 convention the predictor
# expects — same as the notebook's `load()` helper, which converts PIL
# RGB to BGR). Without an argument we synthesize one so the walkthrough
# is self-contained.

# %%
def load_bgr(path: str | None) -> np.ndarray:
    if path:
        import cv2
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return img
    rng = np.random.RandomState(0)
    img = np.full((480, 640, 3), 160, np.uint8)
    img[140:300, 200:420] = (40, 90, 200)  # a "thing" to look at
    img += rng.randint(0, 20, img.shape, dtype=np.uint8)
    return img


# %% [markdown]
# Compute predictions and the annotated overlay. `run_on_opencv_image`
# is the single entry point (boxes + classes + scores; mask contours and
# keypoint skeletons when enabled) — the first call compiles the jitted
# forward, subsequent calls are milliseconds.

# %%
def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    demo = build_demo()
    for path in argv or [None]:
        img = load_bgr(path)
        overlay = demo.run_on_opencv_image(img)
        out = (path or "demo") + ".pred.png"
        try:
            import cv2
            cv2.imwrite(out, overlay)
            print(f"wrote {out} ({overlay.shape[1]}x{overlay.shape[0]})")
        except Exception:
            print(f"prediction ok ({overlay.shape[1]}x{overlay.shape[0]}), "
                  "cv2 unavailable for writing")
    return 0


# %%
if __name__ == "__main__":
    main()
