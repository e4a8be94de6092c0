"""KITTI label txts -> car-only COCO json
(reference tools/kitti/convert_kitti_to_coco.py convert_kitti_car_only:28)."""

from __future__ import annotations

import argparse
import glob
import json
import os

try:
    import cv2
except Exception:
    cv2 = None


def convert(label_dir: str, image_dir: str, out_file: str):
    images, annotations = [], []
    ann_id = 1
    files = sorted(glob.glob(os.path.join(label_dir, "*.txt")))
    for img_id, path in enumerate(files, start=1):
        stem = os.path.splitext(os.path.basename(path))[0]
        img_path = os.path.join(image_dir, stem + ".png")
        if cv2 is not None and os.path.exists(img_path):
            h, w = cv2.imread(img_path).shape[:2]
        else:
            h, w = 375, 1242  # KITTI default
        images.append({"id": img_id, "file_name": stem + ".png",
                       "height": h, "width": w})
        with open(path) as f:
            for line in f:
                parts = line.split()
                if not parts or parts[0] != "Car":
                    continue
                x1, y1, x2, y2 = (float(v) for v in parts[4:8])
                annotations.append({
                    "id": ann_id, "image_id": img_id, "category_id": 1,
                    "bbox": [x1, y1, x2 - x1, y2 - y1],
                    "area": (x2 - x1) * (y2 - y1), "iscrowd": 0,
                    "segmentation": [[x1, y1, x2, y1, x2, y2, x1, y2]],
                })
                ann_id += 1
    with open(out_file, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "car"}]}, f)
    return len(images), len(annotations)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--label-dir", required=True)
    p.add_argument("--image-dir", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)
    n_img, n_ann = convert(args.label_dir, args.image_dir, args.out)
    print(f"{n_img} images, {n_ann} car annotations -> {args.out}")


if __name__ == "__main__":
    main()
