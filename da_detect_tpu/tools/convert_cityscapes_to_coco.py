"""Cityscapes gtFine -> COCO-style instance jsons.

Equivalent of the reference's tools/cityscapes/convert_cityscapes_to_coco.py
(281 LoC + a vendored 18k-line maskrcnn snapshot it imports from — SURVEY
§2.8): parses the ``*_gtFine_polygons.json`` files directly, no
cityscapesScripts dependency. ``--caronly`` reproduces
convert_cityscapes_to_caronly_coco.py. The same json drives the foggy/rainy
domains (pixel-aligned renderings share annotations).
"""

from __future__ import annotations

import argparse
import glob
import json
import os

INSTANCE_CLASSES = ("person", "rider", "car", "truck", "bus", "train",
                    "motorcycle", "bicycle")


def poly_bbox(polygon):
    xs = [p[0] for p in polygon]
    ys = [p[1] for p in polygon]
    x1, y1, x2, y2 = min(xs), min(ys), max(xs), max(ys)
    return [x1, y1, x2 - x1, y2 - y1]


def poly_area(polygon):
    # shoelace
    area = 0.0
    n = len(polygon)
    for i in range(n):
        x1, y1 = polygon[i]
        x2, y2 = polygon[(i + 1) % n]
        area += x1 * y2 - x2 * y1
    return abs(area) / 2.0


def convert_split(gt_dir: str, split: str, out_file: str,
                  classes=INSTANCE_CLASSES, img_suffix="_leftImg8bit.png"):
    categories = [{"id": i + 1, "name": c} for i, c in enumerate(classes)]
    cat_id = {c: i + 1 for i, c in enumerate(classes)}
    images, annotations = [], []
    ann_id = 1
    files = sorted(glob.glob(os.path.join(gt_dir, split, "*",
                                          "*_gtFine_polygons.json")))
    if not files:
        import sys
        print(f"warning: no *_gtFine_polygons.json under "
              f"{os.path.join(gt_dir, split)}", file=sys.stderr)
    for img_id, path in enumerate(files, start=1):
        with open(path) as f:
            gt = json.load(f)
        city = os.path.basename(os.path.dirname(path))
        stem = os.path.basename(path).replace("_gtFine_polygons.json", "")
        images.append({
            "id": img_id,
            "file_name": os.path.join(city, stem + img_suffix),
            "height": gt["imgHeight"],
            "width": gt["imgWidth"],
        })
        for obj in gt["objects"]:
            label = obj["label"]
            if label.endswith("group"):  # crowd groups -> iscrowd
                base = label[:-len("group")]
                crowd = 1
            else:
                base = label
                crowd = 0
            if base not in cat_id:
                continue
            poly = obj["polygon"]
            if len(poly) < 3:
                continue
            flat = [float(v) for pt in poly for v in pt]
            annotations.append({
                "id": ann_id,
                "image_id": img_id,
                "category_id": cat_id[base],
                "bbox": poly_bbox(poly),
                "area": poly_area(poly),
                "iscrowd": crowd,
                "segmentation": [flat],
            })
            ann_id += 1
    os.makedirs(os.path.dirname(out_file) or ".", exist_ok=True)
    with open(out_file, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": categories}, f)
    return len(images), len(annotations)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--gt-dir", required=True, help="gtFine root (contains train/val/test)")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--splits", nargs="+", default=["train", "val"])
    p.add_argument("--caronly", action="store_true")
    args = p.parse_args(argv)
    classes = ("car",) if args.caronly else INSTANCE_CLASSES
    prefix = "caronly" if args.caronly else "instancesonly"
    for split in args.splits:
        out = os.path.join(args.out_dir,
                           f"{prefix}_filtered_gtFine_{split}.json")
        n_img, n_ann = convert_split(args.gt_dir, split, out, classes)
        print(f"{split}: {n_img} images, {n_ann} annotations -> {out}")


if __name__ == "__main__":
    main()
