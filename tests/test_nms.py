"""NMS vs a clean-room numpy greedy reference (same role as the reference's
golden-value tests, tests/test_nms.py there)."""

import jax.numpy as jnp
import numpy as np
import pytest

from da_detect_tpu.ops.nms import nms_mask, nms_topk


def np_greedy_nms(boxes, scores, thresh, plus1=True):
    off = 1.0 if plus1 else 0.0
    order = np.argsort(-scores, kind="stable")
    keep = np.zeros(len(boxes), bool)
    suppressed = np.zeros(len(boxes), bool)
    for oi, i in enumerate(order):
        if suppressed[i]:
            continue
        keep[i] = True
        ai = (boxes[i, 2] - boxes[i, 0] + off) * (boxes[i, 3] - boxes[i, 1] + off)
        for j in order[oi + 1:]:
            if suppressed[j]:
                continue
            iw = min(boxes[i, 2], boxes[j, 2]) - max(boxes[i, 0], boxes[j, 0]) + off
            ih = min(boxes[i, 3], boxes[j, 3]) - max(boxes[i, 1], boxes[j, 1]) + off
            inter = max(iw, 0.0) * max(ih, 0.0)
            aj = (boxes[j, 2] - boxes[j, 0] + off) * (boxes[j, 3] - boxes[j, 1] + off)
            if inter / (ai + aj - inter) > thresh:
                suppressed[j] = True
    return keep


def make_cluster_boxes(n, seed, spread=600.0):
    """Heavily-overlapping clusters, the RPN-proposal regime."""
    rng = np.random.RandomState(seed)
    centers = rng.uniform(50, spread, (max(n // 16, 1), 2))
    out = []
    for k in range(n):
        cx, cy = centers[k % len(centers)]
        cx += rng.uniform(-20, 20)
        cy += rng.uniform(-20, 20)
        w, h = rng.uniform(20, 80, 2)
        out.append([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])
    boxes = np.asarray(out, np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    return boxes, scores


@pytest.mark.parametrize("n,seed,thresh", [(33, 0, 0.5), (200, 1, 0.7),
                                           (513, 2, 0.3), (1000, 3, 0.5)])
def test_nms_matches_greedy(n, seed, thresh):
    boxes, scores = make_cluster_boxes(n, seed)
    want = np_greedy_nms(boxes, scores, thresh)
    got = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                              jnp.ones(n, bool), thresh))
    np.testing.assert_array_equal(got, want)


def test_nms_respects_validity():
    boxes, scores = make_cluster_boxes(64, 4)
    valid = np.arange(64) % 2 == 0
    got = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                              jnp.asarray(valid), 0.5))
    assert not np.any(got & ~valid)
    # equals greedy run on the valid subset
    sub = np_greedy_nms(boxes[valid], scores[valid], 0.5)
    np.testing.assert_array_equal(got[valid], sub)


def test_nms_chunk_boundary_invariance():
    boxes, scores = make_cluster_boxes(600, 5)
    ref = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                              jnp.ones(600, bool), 0.5, chunk=600))
    for chunk in (64, 128, 256):
        got = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                  jnp.ones(600, bool), 0.5, chunk=chunk))
        np.testing.assert_array_equal(got, ref)


def test_nms_topk():
    boxes, scores = make_cluster_boxes(300, 6)
    keep = np_greedy_nms(boxes, scores, 0.5)
    idx, vk = nms_topk(jnp.asarray(boxes), jnp.asarray(scores),
                       jnp.ones(300, bool), 0.5, k=50)
    idx, vk = np.asarray(idx), np.asarray(vk)
    n_kept = int(keep.sum())
    assert vk.sum() == min(50, n_kept)
    # returned indices are exactly the top-scoring survivors
    surv = np.argsort(-scores[keep], kind="stable")
    want = np.flatnonzero(keep)[surv][:min(50, n_kept)]
    np.testing.assert_array_equal(np.sort(idx[vk]), np.sort(want))
    # and sorted by descending score
    assert np.all(np.diff(scores[idx[vk]]) <= 1e-7)


def test_nms_topk_presorted_matches():
    """presorted=True on descending-score input == the sorting path, with
    invalid rows interspersed (the RPN _select_level calling pattern)."""
    boxes, scores = make_cluster_boxes(400, 21)
    rng = np.random.RandomState(22)
    valid = rng.rand(400) > 0.2
    order = np.argsort(-scores, kind="stable")
    bs, ss, vs = boxes[order], scores[order], valid[order]
    idx_a, val_a = nms_topk(jnp.asarray(bs), jnp.asarray(ss), jnp.asarray(vs),
                            0.5, 64)
    idx_b, val_b = nms_topk(jnp.asarray(bs), jnp.asarray(ss), jnp.asarray(vs),
                            0.5, 64, presorted=True)
    np.testing.assert_array_equal(np.asarray(val_a), np.asarray(val_b))
    np.testing.assert_array_equal(np.asarray(idx_a)[np.asarray(val_a)],
                                  np.asarray(idx_b)[np.asarray(val_b)])
