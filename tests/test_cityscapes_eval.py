"""Cityscapes-style instance AP evaluator vs hand-computed values
(reference tools/cityscapes/.../evaluation/cityscapes/eval_instances.py)."""

import numpy as np

from da_detect_tpu.data.evaluation.cityscapes_eval import (
    OVERLAPS, compute_averages, do_cityscapes_evaluation, evaluate_matches,
    match_gts_with_preds)


class FakeDataset:
    def __init__(self, anns_per_img, num_classes=2, hw=(200, 300)):
        self.ids = list(range(len(anns_per_img)))
        self.anns = dict(enumerate(anns_per_img))
        self._hw = hw
        self.json_category_id_to_contiguous_id = {
            i + 10: i + 1 for i in range(num_classes)}
        self.contiguous_category_id_to_json_id = {
            v: k for k, v in self.json_category_id_to_contiguous_id.items()}
        self.cats = {i + 10: {"name": f"cls{i + 1}"}
                     for i in range(num_classes)}

    def get_img_info(self, idx):
        return {"height": self._hw[0], "width": self._hw[1]}


def _ann(x1, y1, x2, y2, cat=10):
    return {"bbox": [x1, y1, x2 - x1, y2 - y1], "category_id": cat}


def _pred(boxes, scores, labels):
    return {"boxes": np.asarray(boxes, np.float32),
            "scores": np.asarray(scores, np.float32),
            "labels": np.asarray(labels, np.int32)}


def test_perfect_prediction_gives_ap_one():
    ds = FakeDataset([[_ann(10, 10, 60, 60)]], num_classes=1)
    preds = {0: _pred([[10, 10, 60, 60]], [0.9], [1])}
    res = do_cityscapes_evaluation(ds, preds)
    assert res["bbox"]["allAp"] == 1.0
    assert res["bbox"]["allAp50%"] == 1.0


def test_high_scored_fp_and_missed_gt():
    """1 TP (s=.9), 1 FP above it (s=.95), 1 missed GT -> AP = 0.125
    (hand-traced through the reference's threshold sweep + step
    integration)."""
    ds = FakeDataset([[_ann(10, 10, 60, 60), _ann(100, 100, 150, 150)]],
                     num_classes=1)
    preds = {0: _pred([[10, 10, 60, 60], [200, 10, 240, 40]], [0.9, 0.95],
                      [1, 1])}
    matches = match_gts_with_preds(ds, preds)
    ap = evaluate_matches(matches, [1])
    np.testing.assert_allclose(ap[0], np.full(len(OVERLAPS), 0.125))


def test_overlap_threshold_splits_ap50_ap75():
    """A pred with IoU ~0.71 counts at 0.50 but is an FP at 0.75+.

    GT ann xywh (0,0,100,100) -> inclusive xyxy (0,0,99,99), area 9801;
    pred (0,0,99,70) -> intersection 99*70 = 6930 = its own area, so
    IoU = 6930 / 9801 = 0.707."""
    ds = FakeDataset([[_ann(0, 0, 100, 100)]], num_classes=1)
    preds = {0: _pred([[0, 0, 99, 70]], [0.8], [1])}
    res = do_cityscapes_evaluation(ds, preds)
    assert res["bbox"]["allAp50%"] == 1.0
    assert res["bbox"]["allAp75%"] == 0.0


def test_duplicate_matches_lower_score_is_fp():
    """Two preds on one GT: higher score is the TP; the lower is an FP whose
    score sits below the TP, so AP stays 1 (zero-width PR step)."""
    ds = FakeDataset([[_ann(10, 10, 110, 110)]], num_classes=1)
    preds = {0: _pred([[10, 10, 110, 110], [12, 12, 110, 110]], [0.9, 0.6],
                      [1, 1])}
    matches = match_gts_with_preds(ds, preds)
    ap = evaluate_matches(matches, [1])
    np.testing.assert_allclose(ap[0, 0], 1.0)


def test_small_gt_region_ignored_and_absorbs_fp():
    """GTs below minRegionSize neither count nor penalize; an unmatched pred
    mostly covering a small GT is dropped from the FP list."""
    ds = FakeDataset([[_ann(10, 10, 15, 15),        # area 25 < 100: ignored
                       _ann(100, 100, 180, 180)]], num_classes=1)
    preds = {0: _pred([[10, 10, 15, 15],            # covers the small GT
                       [100, 100, 180, 180]], [0.7, 0.9], [1, 1])}
    res = do_cityscapes_evaluation(ds, preds)
    assert res["bbox"]["allAp"] == 1.0


def test_absent_class_is_nan_and_excluded_from_mean():
    ds = FakeDataset([[_ann(10, 10, 60, 60, cat=10)]], num_classes=2)
    preds = {0: _pred([[10, 10, 60, 60]], [0.9], [1])}
    matches = match_gts_with_preds(ds, preds)
    ap = evaluate_matches(matches, [1, 2])
    assert np.all(np.isnan(ap[1]))
    avg = compute_averages(ap, ["cls1", "cls2"])
    assert avg["allAp"] == 1.0  # nanmean skips the absent class


def test_consumed_loader_fails_loudly():
    """A one-shot eval loader that yields nothing must raise after the
    (single-process) merge instead of silently evaluating zero images;
    per-process empty shards only warn (multi-host eval shards can be
    legitimately empty)."""
    import pytest

    from da_detect_tpu.engine.inference import compute_on_dataset, inference

    assert compute_on_dataset(None, None, []) == {}
    with pytest.raises(RuntimeError, match="no predictions"):
        inference(None, None, [], None)


def test_cross_class_match_counts_for_gt_class():
    """The reference registers matches BEFORE grouping by class
    (eval_instances.py:230-268), so an overlapping prediction of another
    class can turn a GT into a TP during that GT's class sweep. Here the
    class-1 GT is covered by a class-2 prediction (s=.9) and class 1 also
    has a far-away FP (s=.5): the TP outranks the FP, AP stays 1.0. A
    same-class-only matcher would report AP 0."""
    ds = FakeDataset([[_ann(10, 10, 110, 110, cat=10)]], num_classes=2)
    preds = {0: _pred([[10, 10, 109, 109], [200, 150, 240, 180]],
                      [0.9, 0.5], [2, 1])}
    matches = match_gts_with_preds(ds, preds)
    ap = evaluate_matches(matches, [1, 2])
    np.testing.assert_allclose(ap[0, 0], 1.0)
