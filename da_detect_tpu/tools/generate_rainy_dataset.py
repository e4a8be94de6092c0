"""Rainy auxiliary-domain synthesis.

Equivalent of the reference's vendored EfficientDeRain script
(efficientderain-master/generate_rainy_cityscape.py:19-218): overlays
Garg-Nayar-style rain streaks on clean images with screen compositing
``out = img + rain - img * rain`` (rain_aug, :103-121) to fabricate the
negative/auxiliary domain (Rainy-Cityscapes). The reference samples streak
masks from a rain-streak dataset; this clean-room version synthesizes
procedural streak masks (random motion-blurred line fields at a shared slant
angle) so no external mask data is required — pass ``--mask-dir`` to use real
masks instead.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def synth_rain_mask(h: int, w: int, rng: np.random.RandomState,
                    density: float = 0.0012, length_rng=(18, 42),
                    slant_rng=(-12, 12), thickness: int = 1,
                    intensity_rng=(0.35, 0.9)) -> np.ndarray:
    """Procedural rain-streak field in [0, 1], float32 [h, w]."""
    mask = np.zeros((h, w), np.float32)
    n = int(density * h * w)
    slant = rng.uniform(*slant_rng)
    dx = np.tan(np.deg2rad(slant))
    for _ in range(n):
        x0 = rng.randint(0, w)
        y0 = rng.randint(-10, h)
        length = rng.randint(*length_rng)
        inten = rng.uniform(*intensity_rng)
        x1 = int(x0 + dx * length)
        cv2.line(mask, (x0, y0), (x1, y0 + length), float(inten), thickness)
    # motion blur along the streak direction
    k = 5
    kernel = np.zeros((k, k), np.float32)
    kernel[:, k // 2] = 1.0 / k
    mask = cv2.filter2D(mask, -1, kernel)
    return np.clip(mask, 0.0, 1.0)


def rain_aug(img: np.ndarray, mask: np.ndarray,
             darken: float = 0.85) -> np.ndarray:
    """Screen-composite streaks over a slightly darkened image (the
    reference's ``img + rain - img*rain`` after augment_and_mix)."""
    x = img.astype(np.float32) / 255.0 * darken
    r = mask[..., None]
    out = x + r - x * r
    return (np.clip(out, 0.0, 1.0) * 255.0).astype(np.uint8)


def process_tree(src_root: str, dst_root: str, *, seed: int = 0,
                 mask_dir: str | None = None, exts=(".png", ".jpg", ".jpeg")):
    rng = np.random.RandomState(seed)
    masks = None
    if mask_dir:
        masks = sorted(glob.glob(os.path.join(mask_dir, "*")))
    count = 0
    for dirpath, _, filenames in os.walk(src_root):
        rel = os.path.relpath(dirpath, src_root)
        out_dir = os.path.join(dst_root, rel)
        os.makedirs(out_dir, exist_ok=True)
        for fn in sorted(filenames):
            if not fn.lower().endswith(exts):
                continue
            img = cv2.imread(os.path.join(dirpath, fn), cv2.IMREAD_COLOR)
            if img is None:
                continue
            h, w = img.shape[:2]
            if masks:
                m = cv2.imread(masks[rng.randint(len(masks))],
                               cv2.IMREAD_GRAYSCALE)
                m = cv2.resize(m, (w, h)).astype(np.float32) / 255.0
            else:
                m = synth_rain_mask(h, w, rng)
            cv2.imwrite(os.path.join(out_dir, fn), rain_aug(img, m))
            count += 1
    return count


def main(argv=None):
    p = argparse.ArgumentParser(description="synthesize a rainy domain")
    p.add_argument("--src", required=True, help="clean image tree")
    p.add_argument("--dst", required=True, help="output tree")
    p.add_argument("--mask-dir", default=None,
                   help="optional real rain-streak masks")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    n = process_tree(args.src, args.dst, seed=args.seed, mask_dir=args.mask_dir)
    print(f"wrote {n} rainy images to {args.dst}")


if __name__ == "__main__":
    main()
