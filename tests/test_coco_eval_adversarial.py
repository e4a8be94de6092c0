"""Adversarial fixtures pinning the pycocotools COCOeval semantics the AP
meter depends on.

The reference's evaluator IS pycocotools (reference
data/datasets/evaluation/coco/coco_eval.py:325-337); pycocotools is not
installed here, so every expected value below is hand-derived from the
pycocotools algorithm (cocoeval.py: evaluateImg ~L256-310, accumulate
~L315-380, computeOks ~L203-230) and written out in the comments. Each test
isolates ONE edge semantic:

1. crowd GT = ignore region with inter/area_dt IoU (not union)
2. a crowd GT can absorb multiple detections (no gtm exclusivity)
3. ignore-preference break: a confirmed non-ignored match is kept even when
   a later ignored GT has higher IoU
4. score ties broken by image/insertion order (mergesort stability)
5. GT area gating uses the annotation's ``area`` field, not the bbox area;
   matched detections are never area-gated
6. maxDets truncates score-sorted detections BEFORE matching (AR1/AR10)
7. 101-point interpolated AP of the right-to-left precision envelope
8. OKS: GTs with num_keypoints=0 are ignore-only with the box-proximity
   fallback; detection area comes from keypoint extents

Where the metric definitions overlap, AP50 is cross-checked against the VOC
2010 evaluator (exact-AUC protocol) on identical inputs.
"""

from __future__ import annotations

import numpy as np

from da_detect_tpu.data.evaluation.coco_eval import CocoEvaluator

HW = (100, 100)


class _Dataset:
    """Minimal stand-in exposing the COCODataset surface CocoEvaluator uses."""

    def __init__(self, anns_by_img, cats=(1,), ids=None):
        self.ids = list(anns_by_img) if ids is None else list(ids)
        self.images = [{"id": i, "height": HW[0], "width": HW[1]}
                       for i in self.ids]
        self.eval_anns = anns_by_img
        self.cats = {c: {"name": f"cat{c}"} for c in cats}
        self.contiguous_category_id_to_json_id = {
            i + 1: c for i, c in enumerate(sorted(cats))}
        self.json_category_id_to_contiguous_id = {
            c: i + 1 for i, c in enumerate(sorted(cats))}


def gt(x, y, w, h, cat=1, **kw):
    a = dict(bbox=[x, y, w, h], category_id=cat, iscrowd=0)
    a.setdefault("area", w * h)
    a.update(kw)
    return a


def xyxy(x, y, w, h):
    """Detection in the evaluator's input (xyxy) that converts to legacy
    xywh == [x, y, w, h] under the reference's +1 convention
    (prepare_for_coco_detection)."""
    return [x, y, x + w - 1.0, y + h - 1.0]


def dets(rows):
    """rows: list of (xywh-tuple, score[, label])."""
    return dict(
        boxes=np.asarray([xyxy(*r[0]) for r in rows], np.float64).reshape(-1, 4),
        scores=np.asarray([r[1] for r in rows], np.float64),
        labels=np.asarray([r[2] if len(r) > 2 else 1 for r in rows], np.int64),
    )


def ev(dataset, preds, iou_type="bbox"):
    res, _ = CocoEvaluator(dataset, iou_type).evaluate(preds)
    return res


# ---------------------------------------------------------------- 1. crowd IoU

def test_crowd_iou_is_inter_over_det_area():
    """A det covering 40% of a crowd region has crowd-IoU 1.0 (inter/area_dt),
    so it matches the crowd at every threshold and is ignored — neither TP
    nor FP. Hand-derivation: img1 has only an ignored crowd GT (n_gt 0);
    img2 contributes the single valid GT with an exact TP, so P=R=1 at all
    10 thresholds -> AP exactly 1.0. Under the union rule the same det would
    have IoU 0.4 < 0.5: an FP ranked above the TP, giving the Case-4 style
    half-precision curve instead."""
    ds = _Dataset({1: [gt(0, 0, 10, 10, iscrowd=1)],
                   2: [gt(20, 20, 10, 10)]})
    preds = {1: dets([((0, 0, 4, 10), 0.9)]),
             2: dets([((20, 20, 10, 10), 0.8)])}
    res = ev(ds, preds)
    assert res["AP"] == 1.0
    assert res["AP50"] == 1.0
    assert res["AR100"] == 1.0

    # control: same geometry, crowd flag off -> union IoU 0.4, det1 is a
    # real FP above the TP: pr=[0, 1/2] over n_gt=2, envelope 0.5 up to
    # recall 0.5 -> AP = 51*0.5/101
    ds2 = _Dataset({1: [gt(0, 0, 10, 10)], 2: [gt(20, 20, 10, 10)]})
    res2 = ev(ds2, preds)
    np.testing.assert_allclose(res2["AP"], 51 * 0.5 / 101)


def test_crowd_absorbs_multiple_detections():
    """gtm exclusivity is waived for crowd GTs (evaluateImg: 'continue' only
    if matched AND not crowd): BOTH dets inside the crowd match it and are
    ignored. If the second were forced unmatched it would be an FP above
    the TP and AP would drop to 51*0.5/101."""
    ds = _Dataset({1: [gt(0, 0, 20, 20, iscrowd=1)],
                   2: [gt(20, 20, 10, 10)]})
    preds = {1: dets([((0, 0, 8, 8), 0.95), ((10, 10, 8, 8), 0.9)]),
             2: dets([((20, 20, 10, 10), 0.5)])}
    res = ev(ds, preds)
    assert res["AP"] == 1.0


# ------------------------------------------- 3. ignore-preference break rule

def test_confirmed_match_not_stolen_by_ignored_gt():
    """GT order is non-ignored first; a det that already holds a non-ignored
    match BREAKS before considering ignored GTs, even at higher IoU
    (evaluateImg: 'if m>-1 and gtIg[m]==0 and gtIg[gind]==1: break').

    det xywh [0,0,10,6.2]: IoU 0.62 with GT A [0,0,10,10]; an ignored GT B
    coincides with the det exactly (IoU 1.0). For t in {.50,.55,.60} the det
    matches A -> TP, R=P=1. For t >= .65 A is below threshold, so the det
    falls through to B -> ignored, recall 0, precision 0 at every recall
    point. AP = AR = 3/10."""
    ds = _Dataset({1: [gt(0, 0, 10, 10),
                       gt(0, 0, 10, 6.2, area=62.0, ignore=1)]})
    preds = {1: dets([((0, 0, 10, 6.2), 0.9)])}
    res = ev(ds, preds)
    np.testing.assert_allclose(res["AP"], 0.3)
    np.testing.assert_allclose(res["AR100"], 0.3)


# --------------------------------------------------- 4. score-tie stability

def test_score_ties_keep_image_order():
    """Equal scores are NOT reordered (mergesort): the concatenation order —
    dataset image order — decides which comes first in the PR sweep. An FP
    in image 1 and a TP in image 2, both score 0.5:

    ids [1,2]: sweep [FP, TP] -> pr=[0, 1/2], envelope 0.5 to recall 0.5
               -> AP = 51*0.5/101.
    ids [2,1]: sweep [TP, FP] -> pr=[1, 1/2], envelope 1.0 to recall 0.5
               -> AP = 51*1.0/101."""
    anns = {1: [gt(0, 0, 10, 10)], 2: [gt(0, 0, 10, 10)]}
    preds = {1: dets([((50, 50, 10, 10), 0.5)]),
             2: dets([((0, 0, 10, 10), 0.5)])}
    ap_fp_first = ev(_Dataset(anns, ids=[1, 2]), preds)["AP"]
    ap_tp_first = ev(_Dataset(anns, ids=[2, 1]), preds)["AP"]
    np.testing.assert_allclose(ap_fp_first, 51 * 0.5 / 101)
    np.testing.assert_allclose(ap_tp_first, 51 * 1.0 / 101)


# ------------------------------------------------------- 5. area-range gating

def test_area_gating_uses_annotation_area_not_bbox():
    """Gating reads g['area'] (the segmentation area in real COCO data), not
    the bbox extent: a 10x10-bbox GT with area=10000 is LARGE. Its exact-
    match det (bbox area 100, nominally 'small') is matched, and matched
    dets are never area-gated — only UNMATCHED dets get the out-of-range
    ignore. So APl=1 while APs has no valid GT at all (-1 sentinel)."""
    ds = _Dataset({1: [gt(0, 0, 10, 10, area=10000.0)]})
    preds = {1: dets([((0, 0, 10, 10), 0.9)])}
    res = ev(ds, preds)
    assert res["APl"] == 1.0
    assert res["APs"] == -1.0
    assert res["AP"] == 1.0


def test_unmatched_out_of_range_det_is_ignored_not_fp():
    """In the 'small' slice, an unmatched LARGE det is ignored rather than
    counted FP: with a small GT+TP present, APs stays 1.0. The same FP det
    inside the range (a second small det) drags precision down instead."""
    ds = _Dataset({1: [gt(0, 0, 10, 10)]})       # area 100: small
    preds = {1: dets([((30, 30, 50, 50), 0.95),  # FP, area 2500: out of range
                      ((0, 0, 10, 10), 0.9)])}
    res = ev(ds, preds)
    assert res["APs"] == 1.0
    # control: the same FP moved in-range halves the envelope — with n_gt=1
    # recall still reaches 1.0, so all 101 points read precision 0.5
    preds2 = {1: dets([((30, 30, 10, 10), 0.95), ((0, 0, 10, 10), 0.9)])}
    np.testing.assert_allclose(ev(ds, preds2)["APs"], 0.5)


# --------------------------------------------------------- 6. maxDets order

def test_maxdets_truncates_before_matching():
    """Dets are score-sorted then truncated to maxDets BEFORE matching: with
    an FP at 0.9 and the only TP at 0.8, AR1 sees just the FP (recall 0)
    while AR10/AR100 recover the TP (recall 1). AP (maxDets 100):
    pr=[0, 1/2] over n_gt=1 -> envelope 0.5 across all recall -> 0.5."""
    ds = _Dataset({1: [gt(0, 0, 10, 10)]})
    preds = {1: dets([((50, 50, 10, 10), 0.9), ((0, 0, 10, 10), 0.8)])}
    res = ev(ds, preds)
    assert res["AR1"] == 0.0
    assert res["AR10"] == 1.0
    assert res["AR100"] == 1.0
    np.testing.assert_allclose(res["AP"], 0.5)


# ------------------------------------------- 7. 101-point interpolation math

def test_101_point_interpolated_ap():
    """Four GTs, sweep TP,FP,TP,TP: raw pr=[1, 1/2, 2/3, 3/4] at
    rc=[.25,.25,.5,.75]. Right-to-left envelope: [1,.75,.75,.75].
    101-point sampling (searchsorted left): recThrs 0..0.25 (26 pts) read
    1.0, (0.25..0.75] (50 pts) read 0.75, rest 0 ->
    AP = (26 + 50*0.75)/101 = 63.5/101. AR100 = 0.75."""
    ds = _Dataset({1: [gt(0, 0, 10, 10), gt(20, 0, 10, 10),
                       gt(40, 0, 10, 10), gt(60, 0, 10, 10)]})
    preds = {1: dets([((0, 0, 10, 10), 0.9),
                      ((80, 80, 10, 10), 0.8),   # FP
                      ((20, 0, 10, 10), 0.7),
                      ((40, 0, 10, 10), 0.6)])}
    res = ev(ds, preds)
    np.testing.assert_allclose(res["AP"], 63.5 / 101)
    np.testing.assert_allclose(res["AP50"], 63.5 / 101)
    np.testing.assert_allclose(res["AR100"], 0.75)


def test_ap50_matches_voc2010_exact_auc_when_curve_is_flat():
    """Cross-meter check: when the precision envelope is constant over the
    achieved recall range, COCO's 101-point sample equals VOC-2010's exact
    AUC. Case 6's curve (envelope 0.5, full recall) -> both 0.5."""
    from da_detect_tpu.data.evaluation.voc_eval import voc_ap

    rec = np.array([0.0, 1.0])
    prec = np.array([0.0, 0.5])
    auc = voc_ap(rec, prec, use_07_metric=False)
    ds = _Dataset({1: [gt(0, 0, 10, 10)]})
    preds = {1: dets([((50, 50, 10, 10), 0.9), ((0, 0, 10, 10), 0.8)])}
    np.testing.assert_allclose(ev(ds, preds)["AP50"], auc)
    np.testing.assert_allclose(auc, 0.5)


# ----------------------------------------------------------- 8. OKS protocol

def _kp_row(pts):
    """(K,3) keypoint array at the given (x, y) points, all labeled v=2."""
    return np.asarray([[x, y, 2.0] for x, y in pts], np.float64)


def test_oks_zero_keypoint_gt_is_ignore_with_box_fallback():
    """computeOks: a GT with num_keypoints=0 is ignore-only; its OKS against
    a det uses the box-proximity fallback (distance outside the 3x-expanded
    gt box). img1: zero-kp GT, det kps inside the expanded box -> fallback
    OKS 1.0 -> matched -> ignored (no FP, no n_gt). img2: labeled GT with
    exact det -> TP. AP = AR20 = 1.0 exactly."""
    kp1 = _kp_row([(5, 5), (8, 8), (2, 7)])
    ds = _Dataset({
        1: [gt(0, 0, 10, 10, keypoints=[0.0] * 9, num_keypoints=0)],
        2: [gt(0, 0, 10, 10, keypoints=kp1.ravel().tolist(), num_keypoints=3)],
    })
    preds = {
        1: dict(boxes=np.asarray([xyxy(0, 0, 10, 10)]),
                scores=np.asarray([0.9]), labels=np.asarray([1]),
                keypoints=np.asarray([_kp_row([(5, 5), (6, 6), (7, 7)])])),
        2: dict(boxes=np.asarray([xyxy(0, 0, 10, 10)]),
                scores=np.asarray([0.8]), labels=np.asarray([1]),
                keypoints=np.asarray([kp1])),
    }
    res = ev(ds, preds, "keypoints")
    assert res["AP"] == 1.0
    assert res["AR20"] == 1.0
    # control: drop img1's det -> nothing changes (it was pure ignore)
    preds1 = dict(preds)
    preds1[1] = dict(boxes=np.zeros((0, 4)), scores=np.zeros(0),
                     labels=np.zeros(0, np.int64),
                     keypoints=np.zeros((0, 3, 3)))
    assert ev(ds, preds1, "keypoints")["AP"] == 1.0


def test_oks_det_area_comes_from_keypoint_extents():
    """pycocotools loadRes derives kp-det bbox/area from keypoint extents,
    which drives the medium/large gating: a det whose kps span 50x50
    (area 2500, medium) matching a medium GT contributes to APm and not
    APl."""
    pts = [(10, 10), (60, 60), (10, 60)]
    kps = _kp_row(pts)
    ds = _Dataset({1: [gt(10, 10, 50, 50, area=2500.0,
                          keypoints=kps.ravel().tolist(), num_keypoints=3)]})
    preds = {1: dict(boxes=np.asarray([xyxy(10, 10, 50, 50)]),
                     scores=np.asarray([0.9]), labels=np.asarray([1]),
                     keypoints=np.asarray([kps]))}
    res = ev(ds, preds, "keypoints")
    assert res["APm"] == 1.0
    assert res["APl"] == -1.0
    assert res["AP"] == 1.0


# --------------------------------------------------------- segm protocol
# Mask-eval semantics the reference relies on through pycocotools maskUtils
# (reference coco_eval.py:232-268 prepare_for_coco_segmentation + COCOeval
# iouType='segm'): IoU on rasterized mask pixels, crowd-as-ignore on mask
# pixels, det area = mask pixel count, empty masks. Every expected value is
# hand-derived in the comments.

def rect_poly(x, y, w, h):
    """Polygon whose fillPoly rasterization is exactly the w x h pixel rect
    at (x, y) (OpenCV fills the boundary, so corners go to x+w-1/y+h-1 —
    verified against cv2.fillPoly inclusivity)."""
    return [[x, y, x + w - 1, y, x + w - 1, y + h - 1, x, y + h - 1]]


def seg_dets(rows):
    """rows: list of ((x, y, w, h), score, mask_cols or None).
    The prob map is built at the exact paste-crop size (h, w), so pasting is
    interpolation-free: mask == box rect, optionally only the first
    ``mask_cols`` columns (None = full box)."""
    boxes, scores, probs = [], [], []
    for (x, y, w, h), score, cols in rows:
        boxes.append(xyxy(x, y, w, h))
        scores.append(score)
        p = np.zeros((h, w), np.float32)
        p[:, : (w if cols is None else cols)] = 1.0
        probs.append(p)
    return dict(boxes=np.asarray(boxes, np.float64).reshape(-1, 4),
                scores=np.asarray(scores, np.float64),
                labels=np.ones(len(rows), np.int64),
                mask_probs=probs)


def test_mask_iou_diverges_from_box_iou():
    """The ranking flip that separates segm from bbox eval: the GT mask is
    the LEFT HALF (10x20=200px) of its 20x20 bbox. Det A (score .9) has the
    perfect BOX (IoU_box=1.0) but a full-box mask -> IoU_mask=200/400=0.5;
    det B (score .8) has the perfect MASK (IoU_mask=1.0) but half the box
    (IoU_box=0.5). segm: t=.50 A matches (0.5>=0.5), B is FP below it ->
    AP@.50=1; t=.55...95 A is an FP ABOVE B's TP -> pr envelope 0.5 ->
    AP_t=0.5. AP = (1 + 9*0.5)/10 = 0.55. bbox on the same preds: A is a
    perfect TP at every t -> AP=1.0."""
    ds = _Dataset({1: [gt(10, 10, 20, 20, area=200.0,
                          segmentation=rect_poly(10, 10, 10, 20))]})
    preds = {1: seg_dets([((10, 10, 20, 20), 0.9, None),
                          ((10, 10, 10, 20), 0.8, None)])}
    res = ev(ds, preds, "segm")
    np.testing.assert_allclose(res["AP50"], 1.0)
    np.testing.assert_allclose(res["AP75"], 0.5)
    np.testing.assert_allclose(res["AP"], 0.55)
    res_box = ev(ds, preds, "bbox")
    np.testing.assert_allclose(res_box["AP"], 1.0)


def test_segm_crowd_ignore_uses_mask_pixels():
    """Crowd absorption is decided on MASK pixels with the inter/area_dt
    rule: the det's 5x20=100px mask lies strictly inside the 10x20=200px
    crowd mask -> crowd-IoU 100/100 = 1.0 at every t -> matched-ignored
    (union IoU would be 0.5 and fail t>=.55). img2 supplies the only real
    GT with an exact TP -> AP must be exactly 1.0. Control: same geometry
    with iscrowd=0 -> at t>=.55 the inside-det is an FP above the TP:
    n_gt=2, pr=[0,.5], rc=[0,.5] -> AP_t=51*.5/101; AP50 stays 1 (IoU .5
    match) -> AP=(1+9*51*.5/101)/10."""
    crowd = gt(10, 10, 10, 20, area=200.0, iscrowd=1,
               segmentation=rect_poly(10, 10, 10, 20))
    clean = gt(50, 50, 10, 10, area=100.0,
               segmentation=rect_poly(50, 50, 10, 10))
    preds = {1: seg_dets([((10, 10, 40, 20), 0.9, 5)]),
             2: seg_dets([((50, 50, 10, 10), 0.8, None)])}
    res = ev(_Dataset({1: [crowd], 2: [clean]}), preds, "segm")
    np.testing.assert_allclose(res["AP"], 1.0)
    np.testing.assert_allclose(res["AR100"], 1.0)

    ctl = gt(10, 10, 10, 20, area=200.0,
             segmentation=rect_poly(10, 10, 10, 20))
    res2 = ev(_Dataset({1: [ctl], 2: [clean]}), preds, "segm")
    np.testing.assert_allclose(res2["AP"], (1.0 + 9 * 51 * 0.5 / 101) / 10)


def test_segm_det_area_is_mask_pixels_not_box():
    """pycocotools loadRes sets a segm det's area from its mask
    (maskUtils.area), not its box: an unmatched det with a 40x40=1600px BOX
    but a 20x40=800px MASK is in-range for the small bucket (<=32^2) and
    must count as an FP there -> APs=0.5 (FP ranked above img1's small TP,
    n_gt_small=1). If the box area (1600, out of range) were used it would
    be ignored and APs would wrongly be 1.0 — proven by the control where
    the mask really is 1600px."""
    small_gt = gt(10, 10, 20, 20, area=400.0,
                  segmentation=rect_poly(10, 10, 20, 20))
    ds = _Dataset({1: [small_gt], 2: []}, ids=[1, 2])
    preds_small_mask = {1: seg_dets([((10, 10, 20, 20), 0.8, None)]),
                        2: seg_dets([((30, 30, 40, 40), 0.9, 20)])}
    res = ev(ds, preds_small_mask, "segm")
    np.testing.assert_allclose(res["APs"], 0.5)

    preds_big_mask = {1: seg_dets([((10, 10, 20, 20), 0.8, None)]),
                      2: seg_dets([((30, 30, 40, 40), 0.9, None)])}
    res2 = ev(ds, preds_big_mask, "segm")
    np.testing.assert_allclose(res2["APs"], 1.0)


def test_segm_empty_masks():
    """Degenerate masks on both sides: a det whose probs are all below the
    paste threshold has an EMPTY mask -> IoU 0 with everything -> plain FP;
    a GT whose polygon is degenerate (<3 points) rasterizes empty -> it can
    never be matched but still counts in n_gt (it is NOT auto-ignored) ->
    permanent FN. Combined: dets sorted (empty-mask FP .9, TP .8), n_gt=2
    -> tp=[0,1], fp=[1,1], rc=[0,.5], pr envelope .5 -> AP_t=51*.5/101."""
    good = gt(10, 10, 20, 20, area=400.0,
              segmentation=rect_poly(10, 10, 20, 20))
    degenerate = gt(50, 50, 10, 10, area=100.0,
                    segmentation=[[50.0, 50.0, 55.0, 50.0]])
    preds = {1: seg_dets([((10, 10, 20, 20), 0.8, None),
                          ((40, 40, 10, 10), 0.9, 0)])}
    res = ev(_Dataset({1: [good, degenerate]}), preds, "segm")
    np.testing.assert_allclose(res["AP"], 51 * 0.5 / 101)
    np.testing.assert_allclose(res["AR100"], 0.5)
