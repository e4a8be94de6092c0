"""Evaluator correctness: perfect predictions score AP ~1, degraded
predictions score less; crowd regions are ignored (COCOeval protocol)."""

import numpy as np
import pytest

import tests.data_factory as factory
from da_detect_tpu.data.datasets import COCODataset
from da_detect_tpu.data.evaluation.coco_eval import CocoEvaluator
from da_detect_tpu.data.masker import rasterize_polygons_crop


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("eval_coco")
    dirs = factory.make_triplet_datasets(str(root), n_images=6)
    img_dir, ann = dirs["clean"]
    return COCODataset(ann, img_dir, remove_images_without_annotations=False)


def perfect_predictions(dataset, jitter=0.0, mask=False, seed=0):
    rng = np.random.RandomState(seed)
    preds = {}
    for idx in range(len(dataset)):
        s = dataset.sample(idx)
        boxes = s["boxes"].copy()
        if jitter:
            boxes = boxes + rng.uniform(-jitter, jitter, boxes.shape)
        p = dict(boxes=boxes,
                 scores=np.linspace(0.9, 0.5, len(boxes)),
                 labels=s["labels"])
        if mask:
            probs = []
            for segs, b in zip(s["segmentations"], s["boxes"]):
                m, (y0, x0) = rasterize_polygons_crop(segs, (s["height"],
                                                             s["width"]))
                # resample the crop into a 28x28 box-frame prob map
                import cv2
                full = np.zeros((s["height"], s["width"]), np.float32)
                full[y0:y0 + m.shape[0], x0:x0 + m.shape[1]] = m
                x1, y1, x2, y2 = (int(v) for v in b)
                crop = full[y1:y2 + 1, x1:x2 + 1]
                probs.append(cv2.resize(crop, (28, 28)))
            p["mask_probs"] = np.asarray(probs)
        preds[s["image_id"]] = p
    return preds


def test_perfect_bbox_ap(dataset):
    res, per_cat = CocoEvaluator(dataset).evaluate(
        perfect_predictions(dataset))
    assert res["AP50"] > 0.99, res
    assert res["AP"] > 0.9, res
    for r in per_cat.values():
        assert r["AP50"] > 0.99


def test_jittered_bbox_ap_degrades(dataset):
    res_p, _ = CocoEvaluator(dataset).evaluate(perfect_predictions(dataset))
    res_j, _ = CocoEvaluator(dataset).evaluate(
        perfect_predictions(dataset, jitter=6.0))
    assert res_j["AP"] < res_p["AP"]
    assert res_j["AP75"] < res_p["AP75"]


def test_perfect_segm_ap(dataset):
    res, _ = CocoEvaluator(dataset, "segm").evaluate(
        perfect_predictions(dataset, mask=True))
    assert res["AP50"] > 0.95, res


def test_missing_detections_lower_recall(dataset):
    preds = perfect_predictions(dataset)
    # drop all but one detection per image
    for p in preds.values():
        for k in ("boxes", "scores", "labels"):
            p[k] = p[k][:1]
    res, _ = CocoEvaluator(dataset).evaluate(preds)
    assert res["AR100"] < 0.99
    assert 0.0 < res["AP50"] < 1.0


# --------------------------- keypoint (OKS) protocol ------------------------

def kp_predictions(dataset, jitter=0.0, seed=0):
    rng = np.random.RandomState(seed)
    preds = {}
    for idx in range(len(dataset)):
        s = dataset.sample(idx)
        kps = np.asarray([np.asarray(k, np.float32).reshape(-1, 3)
                          for k in s["keypoints"]])
        if jitter:
            kps[..., :2] += rng.uniform(-jitter, jitter, kps[..., :2].shape)
        kps[..., 2] = 1.0  # predicted keypoint score column
        preds[s["image_id"]] = dict(
            boxes=s["boxes"], scores=np.linspace(0.9, 0.5, len(s["boxes"])),
            labels=s["labels"], keypoints=kps)
    return preds


def test_perfect_keypoints_oks_ap(dataset):
    res, per_cat = CocoEvaluator(dataset, "keypoints").evaluate(
        kp_predictions(dataset))
    assert res["AP"] > 0.99, res
    assert res["AP50"] > 0.99, res
    assert set(res) == {"AP", "AP50", "AP75", "APm", "APl", "AR20",
                        "ARm", "ARl"}


def test_jittered_keypoints_oks_degrades(dataset):
    res_p, _ = CocoEvaluator(dataset, "keypoints").evaluate(
        kp_predictions(dataset))
    res_j, _ = CocoEvaluator(dataset, "keypoints").evaluate(
        kp_predictions(dataset, jitter=6.0))
    assert res_j["AP"] < res_p["AP"]
    assert res_j["AP"] > 0.0  # 6px off on tiny boxes: degraded, not zero
