"""Evaluation engine (reference engine/inference.py:18-129).

compute_on_dataset becomes one jitted eval forward per fixed-shape batch;
predictions are brought to host, unpadded, rescaled to original image sizes,
and handed to the dataset evaluator (COCO-style mAP in
data/evaluation). Multi-host: each process evaluates its shard and
predictions are merged host-side (replacing the pickle all_gather,
inference.py:54-73).
"""

from __future__ import annotations

import logging
import time
from collections import OrderedDict
from typing import Any

import jax
import numpy as np

log = logging.getLogger(__name__)


# Memoized jitted eval steps. A fresh ``jax.jit(lambda ...)`` per call
# would defeat jit's own trace/executable cache: every compute_on_dataset
# call (each TTA pass, each in-training eval) would re-trace and re-load
# the executable — tens of seconds for the biggest programs even on a
# persistent-compile-cache hit. Keyed by model identity; the value keeps a
# strong ref to the model so an id() can't be recycled while cached.
# LRU-bounded: the jitted fn closes over the model, so an unbounded cache
# would pin every model instance (params closure + executables) ever
# evaluated in the process — a leak for long-lived eval services or config
# sweeps. 8 entries covers {plain, masks, keypoints} × a couple of live
# models; test_net_batch reuses one model across checkpoints so it stays
# a 100% hit either way.
_EVAL_STEP_CACHE: OrderedDict = OrderedDict()
_EVAL_STEP_CACHE_MAX = 8


def _eval_step_for(model, with_masks: bool, with_keypoints: bool,
                   packed: bool = False):
    key = (id(model), with_masks, with_keypoints, packed)
    hit = _EVAL_STEP_CACHE.get(key)
    if hit is not None and hit[0] is model:
        _EVAL_STEP_CACHE.move_to_end(key)
        return hit[1]

    def call(v, b):
        if with_masks:
            return model.apply(v, b, with_masks=True)
        if with_keypoints:
            return model.apply(v, b, with_keypoints=True)
        return model.apply(v, b)

    if packed:
        # packed eval transport (data/packing.py): the batch arrives as one
        # byte buffer; the packer is a static arg keyed by layout
        fn = jax.jit(lambda v, buf, pk: call(v, pk.unpack(buf)),
                     static_argnums=2)
    else:
        fn = jax.jit(call)
    _EVAL_STEP_CACHE[key] = (model, fn)
    while len(_EVAL_STEP_CACHE) > _EVAL_STEP_CACHE_MAX:
        _EVAL_STEP_CACHE.popitem(last=False)
    return fn


def compute_on_dataset(model, variables, data_loader, progress_every: int = 50,
                       with_masks: bool = False, with_keypoints: bool = False):
    """Returns {image_id: dict(boxes, scores, labels[, mask_probs]
    [, keypoints])} in *original* image coordinates (xyxy).

    The loop keeps ONE batch in flight: batch N+1 is dispatched (and, with
    the packed transport, its single transfer overlaps the device) while
    batch N's detections are fetched and post-processed — on relayed
    attachments a fully synchronous loop pays the round-trip latency twice
    per batch (reference inference.py:104-110 there is synchronous)."""
    predictions: dict[int, Any] = {}
    t0 = time.perf_counter()
    n_images = 0

    def flush(out, image_ids, sizes, orig):
        nonlocal n_images
        out = jax.device_get(out)
        mask_probs = keypoints = None
        if with_masks:
            dets, mask_probs = out
        elif with_keypoints:
            dets, keypoints = out
        else:
            dets = out
        for i, img_id in enumerate(image_ids):
            if img_id is None:  # padding entry of the last batch
                continue
            valid = dets.valid[i]
            boxes = dets.boxes[i][valid]
            # rescale from the resized frame to the original image
            sy = orig[i, 0] / max(sizes[i, 0], 1)
            sx = orig[i, 1] / max(sizes[i, 1], 1)
            boxes = boxes * np.array([sx, sy, sx, sy], np.float32)
            predictions[img_id] = dict(
                boxes=boxes,
                scores=dets.scores[i][valid],
                labels=dets.labels[i][valid],
            )
            if mask_probs is not None:
                predictions[img_id]["mask_probs"] = mask_probs[i][valid]
            if keypoints is not None:
                kp = keypoints[i][valid].astype(np.float32).copy()
                kp[..., 0] *= sx
                kp[..., 1] *= sy
                predictions[img_id]["keypoints"] = kp
            n_images += 1

    pending = None
    for bi, (batch, image_ids) in enumerate(data_loader):
        if isinstance(batch, tuple):  # packed eval transport (build.py)
            buf, packer, sizes, orig = batch
            eval_step = _eval_step_for(model, with_masks, with_keypoints,
                                       packed=True)
            out = eval_step(variables, buf, packer)
        else:
            eval_step = _eval_step_for(model, with_masks, with_keypoints)
            out = eval_step(variables, batch)
            sizes = np.asarray(jax.device_get(batch.sizes))
            orig = np.asarray(jax.device_get(batch.orig_sizes))
        if pending is not None:
            flush(*pending)
        pending = (out, image_ids, np.asarray(sizes), np.asarray(orig))
        if progress_every and (bi + 1) % progress_every == 0:
            dt = time.perf_counter() - t0
            log.info("eval %d images (%.3f s/img)", n_images,
                     dt / max(n_images, 1))
    if pending is not None:
        flush(*pending)
    total = time.perf_counter() - t0
    log.info("total eval time: %.1fs (%.4f s/img, %d images)", total,
             total / max(n_images, 1), n_images)
    if n_images == 0:
        # may be legitimate under multi-host sharding (shard smaller than
        # process count); inference() raises after the cross-process merge
        log.warning("evaluation loader yielded no images on this process")
    return predictions


def inference(model, variables, data_loader, dataset, *, iou_types=("bbox",),
              output_folder: str | None = None, expected_results=None,
              expected_results_sigma_tol: float = 4.0, style: str = "coco"):
    """Full eval: predictions + dataset-specific evaluation
    (reference inference.py:76-129). Multi-host: every process evaluates its
    loader shard; predictions are merged across processes."""
    predictions = compute_on_dataset(model, variables, data_loader,
                                     with_masks="segm" in iou_types,
                                     with_keypoints="keypoints" in iou_types)
    from ..utils import comm
    if comm.get_world_size() > 1:
        predictions = comm.accumulate_predictions(predictions)
    if not predictions:
        # a consumed (one-shot) loader would otherwise evaluate nothing and
        # report NaN APs silently
        raise RuntimeError(
            "evaluation produced no predictions — eval loaders are "
            "single-pass; build a fresh one per inference() call")
    from ..data.evaluation import evaluate
    results = evaluate(dataset, predictions, output_folder=output_folder,
                       iou_types=iou_types, style=style)
    if expected_results:
        check_expected_results(results, expected_results,
                               expected_results_sigma_tol)
    return results, predictions


def check_expected_results(results, expected, sigma_tol):
    """Regression gate (reference coco_eval.py:396-414)."""
    for task, metric, mean, std in expected:
        actual = results[task][metric]
        lo, hi = mean - sigma_tol * std, mean + sigma_tol * std
        msg = (f"{task} > {metric}: {actual:.4f} expected in "
               f"[{lo:.4f}, {hi:.4f}]")
        if not (lo < actual < hi):
            log.error("FAIL: %s", msg)
            raise AssertionError(msg)
        log.info("PASS: %s", msg)
