"""Synthetic COCO-style dataset fabrication for end-to-end tests/drives.

Creates a tiny aligned triple of datasets (clean / "foggy" / "rainy") under a
temp data dir: images are noise with bright rectangles at the GT boxes (so a
detector has learnable signal), foggy/rainy are pixel-aligned degradations of
the same images — the same structural relationship as
Cityscapes / Foggy-Cityscapes / Rainy-Cityscapes.
"""

from __future__ import annotations

import json
import os

import numpy as np

try:
    import cv2
except Exception:
    cv2 = None

CATS = [{"id": 1, "name": "car"}, {"id": 2, "name": "person"}]


def _make_image(rng, h, w, boxes, labels):
    img = rng.randint(0, 60, (h, w, 3), dtype=np.uint8)
    for (x1, y1, x2, y2), lab in zip(boxes, labels):
        color = (220, 40, 40) if lab == 1 else (40, 220, 40)
        img[int(y1):int(y2), int(x1):int(x2)] = color
    return img


def make_triplet_datasets(root: str, n_images: int = 8, h: int = 120,
                          w: int = 160, seed: int = 0):
    """Writes clean/foggy/rainy image trees + annotation jsons. Returns the
    dataset-name -> (img_dir, ann_file) mapping written under ``root``."""
    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    clean_dir = os.path.join(root, "clean")
    foggy_dir = os.path.join(root, "foggy")
    rainy_dir = os.path.join(root, "rainy")
    for d in (clean_dir, foggy_dir, rainy_dir):
        os.makedirs(d, exist_ok=True)

    for i in range(n_images):
        n_box = rng.randint(1, 4)
        boxes, labels = [], []
        for _ in range(n_box):
            bw, bh = (int(v) for v in rng.randint(15, 40, 2))
            x1 = int(rng.randint(0, w - bw - 1))
            y1 = int(rng.randint(0, h - bh - 1))
            boxes.append([x1, y1, x1 + bw, y1 + bh])
            labels.append(int(rng.randint(1, 3)))
        img = _make_image(rng, h, w, boxes, labels)
        fog = (img.astype(np.float32) * 0.55 + 110).clip(0, 255).astype(np.uint8)
        rain = img.copy()
        rain[:, ::7] = np.minimum(rain[:, ::7].astype(int) + 120, 255).astype(np.uint8)
        name = f"img_{i:04d}.png"
        for d, arr in ((clean_dir, img), (foggy_dir, fog), (rainy_dir, rain)):
            cv2.imwrite(os.path.join(d, name), arr)
        images.append({"id": i + 1, "file_name": name, "height": h, "width": w})
        for b, lab in zip(boxes, labels):
            # 17 visible keypoints on a deterministic interior grid — enough
            # structure for the OKS protocol to score perfect/jittered preds
            kx = b[0] + (np.arange(17) % 4 + 0.5) / 4.0 * (b[2] - b[0])
            ky = b[1] + (np.arange(17) // 4 + 0.5) / 5.0 * (b[3] - b[1])
            kps = np.stack([kx, ky, np.full(17, 2.0)], 1).reshape(-1)
            annotations.append({
                "id": ann_id, "image_id": i + 1, "category_id": lab,
                "bbox": [b[0], b[1], b[2] - b[0], b[3] - b[1]],
                "area": (b[2] - b[0]) * (b[3] - b[1]), "iscrowd": 0,
                "segmentation": [[b[0], b[1], b[2], b[1], b[2], b[3],
                                  b[0], b[3]]],
                "keypoints": [round(float(v), 2) for v in kps],
                "num_keypoints": 17,
            })
            ann_id += 1

    ann = {"images": images, "annotations": annotations, "categories": CATS}
    ann_path = os.path.join(root, "instances.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    return {"clean": (clean_dir, ann_path), "foggy": (foggy_dir, ann_path),
            "rainy": (rainy_dir, ann_path)}


def register_tiny_catalog(dirs: dict):
    """Point tiny_* catalog names at the synthetic tree; everything else
    falls through to the real catalog (tests run in one process)."""
    from da_detect_tpu.config.catalog import DatasetCatalog

    original_get = DatasetCatalog.get

    def get(name):
        key = ("clean" if "tiny_clean" in name
               else "foggy" if "tiny_foggy" in name
               else "rainy" if "tiny_rainy" in name else None)
        if key is None:
            return original_get(name)
        img_dir, ann = dirs[key]
        return {"factory": "COCODataset",
                "args": {"root": img_dir, "ann_file": ann}}

    DatasetCatalog.get = staticmethod(get)
    return get
