"""The reference's one surviving real-data artifact, end-to-end through the
from-scratch eval stack.

`/root/reference/inference/rainy_cityscapes_fine_instanceonly_seg_val_cocostyle/bbox.json`
is the trained WACV model's actual detection dump over the 500-image rainy
Cityscapes val set (27k detections, 8 classes, realistic score
distribution), produced by the reference's own
``prepare_for_coco_detection`` (reference
data/datasets/evaluation/coco/coco_eval.py:81-112: xyxy -> legacy xywh with
TO_REMOVE=1). No GT annotations ship with it, so mAP parity is impossible
— instead the dump itself is both sides of the protocol:

* GT := the high-confidence (score >= 0.7) detections. Then every GT is
  matched by its own identical detection at IoU 1.0, all such detections
  outrank every non-GT detection, and AP must be exactly 1.0 for every
  category that has GT — a computable expected result over fully
  distribution-realistic inputs (box shapes, category imbalance, ~54
  dets/image).
* Perturbations with known ranking effects: jittered boxes must lose AP
  but stay high (IoU-threshold sweep territory); shuffled scores must lose
  strictly more (ranking destroyed); both must stay monotone.

This exercises the evaluator far beyond the synthetic fixtures: real
category ids, the xywh+1 convention round-trip, 500-image accumulation,
and the per-category table over the 8 Cityscapes classes.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

DUMP = ("/root/reference/inference/"
        "rainy_cityscapes_fine_instanceonly_seg_val_cocostyle/bbox.json")
pytestmark = pytest.mark.skipif(not os.path.isfile(DUMP),
                                reason="reference detection dump not available")

# Cityscapes instance classes in the reference's json category order
# (reference data/datasets/evaluation/coco uses the dataset's own ids 1..8)
CITYSCAPES_CLASSES = ("person", "rider", "car", "truck", "bus", "train",
                      "motorcycle", "bicycle")
GT_SCORE = 0.7
CITYSCAPES_HW = (1024, 2048)


@pytest.fixture(scope="module")
def dump():
    with open(DUMP) as f:
        dets = json.load(f)
    assert len(dets) > 20000  # the real artifact, not a stub
    return dets


@pytest.fixture(scope="module")
def dataset(dump, tmp_path_factory):
    """COCODataset whose annotations are the dump's high-confidence
    detections (bbox xywh carried over verbatim)."""
    from da_detect_tpu.data.datasets import COCODataset

    img_ids = sorted({d["image_id"] for d in dump})
    images = [dict(id=i, file_name=f"{i}.png", height=CITYSCAPES_HW[0],
                   width=CITYSCAPES_HW[1]) for i in img_ids]
    annotations = [
        dict(id=k + 1, image_id=d["image_id"], category_id=d["category_id"],
             bbox=list(d["bbox"]), area=d["bbox"][2] * d["bbox"][3],
             iscrowd=0)
        for k, d in enumerate(dump) if d["score"] >= GT_SCORE]
    categories = [dict(id=i + 1, name=n)
                  for i, n in enumerate(CITYSCAPES_CLASSES)]
    root = tmp_path_factory.mktemp("dump_eval")
    ann = root / "gt.json"
    ann.write_text(json.dumps(dict(images=images, annotations=annotations,
                                   categories=categories)))
    return COCODataset(str(ann), str(root),
                       remove_images_without_annotations=False)


def _to_predictions(dump, dataset, img_ids=None, rng=None, jitter=0.0,
                    shuffle_scores=False):
    """Dump rows -> the repo prediction format {image_id: dict(boxes xyxy,
    scores, labels contiguous)} — inverting the evaluator's legacy
    xyxy -> xywh(+1) conversion so an unperturbed round-trip reproduces the
    dump's xywh exactly."""
    keep = set(img_ids) if img_ids is not None else None
    per_img: dict[int, list] = {}
    for d in dump:
        if keep is not None and d["image_id"] not in keep:
            continue
        x, y, w, h = d["bbox"]
        box = [x, y, x + w - 1.0, y + h - 1.0]
        if jitter:
            box = [v + rng.uniform(-jitter, jitter) for v in box]
        lab = dataset.json_category_id_to_contiguous_id[d["category_id"]]
        per_img.setdefault(d["image_id"], []).append(
            (box, d["score"], lab))
    preds = {}
    for i, rows in per_img.items():
        boxes = np.asarray([r[0] for r in rows], np.float32)
        scores = np.asarray([r[1] for r in rows], np.float32)
        if shuffle_scores:
            scores = rng.permutation(scores)
        preds[i] = dict(boxes=boxes, scores=scores,
                        labels=np.asarray([r[2] for r in rows], np.int32))
    return preds


def _gt_categories(dump):
    return sorted({d["category_id"] for d in dump if d["score"] >= GT_SCORE})


def test_self_consistent_ap_is_exactly_one(dump, dataset):
    """Full 500-image artifact: GT := its own >= 0.7 detections, so
    precision is 1 at every recall level and AP/AP50/AP75 must be 1.0 for
    every category with GT; the per-category table must cover all 8
    Cityscapes classes."""
    from da_detect_tpu.data.evaluation.coco_eval import do_coco_evaluation

    preds = _to_predictions(dump, dataset)
    results = do_coco_evaluation(dataset, preds)["bbox"]
    per_cat = results["per_category"]
    assert sorted(per_cat) == sorted(CITYSCAPES_CLASSES)
    with_gt = {CITYSCAPES_CLASSES[c - 1] for c in _gt_categories(dump)}
    for name, row in per_cat.items():
        if name in with_gt:
            np.testing.assert_allclose(row["AP"], 1.0, atol=1e-6,
                                       err_msg=name)
            np.testing.assert_allclose(row["AP50"], 1.0, atol=1e-6,
                                       err_msg=name)
    for metric in ("AP", "AP50", "AP75"):
        np.testing.assert_allclose(results[metric], 1.0, atol=1e-6)

    # the regression gate consumes the same results structure
    # (reference coco_eval.py:396-414)
    from da_detect_tpu.engine.inference import check_expected_results
    check_expected_results({"bbox": results},
                           [("bbox", "AP", 1.0, 0.005)], sigma_tol=4.0)
    with pytest.raises(AssertionError):
        check_expected_results({"bbox": results},
                               [("bbox", "AP", 0.4, 0.005)], sigma_tol=4.0)


@pytest.fixture(scope="module")
def subset_ids(dump):
    return sorted({d["image_id"] for d in dump})[:100]


def test_perturbations_rank_as_expected(dump, dataset, subset_ids):
    """Known ranking effects on a 100-image subset: exact round-trip
    (AP 1.0) > jittered boxes (high but < 1) > shuffled scores (clearly
    lower) — the evaluator must order corruption severity correctly."""
    from da_detect_tpu.data.evaluation.coco_eval import CocoEvaluator

    def ap_of(**kw):
        rng = np.random.RandomState(0)
        preds = _to_predictions(dump, dataset, img_ids=subset_ids, rng=rng,
                                **kw)
        res, _ = CocoEvaluator(dataset, "bbox").evaluate(preds)
        return res["AP"]

    exact = ap_of()
    jittered = ap_of(jitter=4.0)     # +-4 px on 1024x2048 boxes
    shuffled = ap_of(shuffle_scores=True)
    np.testing.assert_allclose(exact, 1.0, atol=1e-6)
    assert 0.5 < jittered < 0.999, jittered
    assert shuffled < jittered, (shuffled, jittered)
    assert shuffled < 0.9, shuffled
