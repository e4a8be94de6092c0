"""Pallas NMS kernel vs the greedy oracle (interpreter mode on CPU; compiled
agreement with the XLA fixpoint is exercised on TPU by bench/drives)."""

import jax.numpy as jnp
import numpy as np

import da_detect_tpu.ops.nms_pallas as NP
from tests.test_nms import make_cluster_boxes, np_greedy_nms

NP.INTERPRET = True


def test_pallas_nms_matches_greedy():
    boxes, scores = make_cluster_boxes(2100, 11)
    order = np.argsort(-scores, kind="stable")
    want = np_greedy_nms(boxes, scores, 0.5)[order]
    got = np.asarray(NP.nms_mask_pallas_sorted(
        jnp.asarray(boxes[order]), jnp.ones(len(boxes), bool), 0.5))
    np.testing.assert_array_equal(got, want)


def test_pallas_nms_topk():
    boxes, scores = make_cluster_boxes(1500, 12)
    keep = np_greedy_nms(boxes, scores, 0.7)
    idx, valid = NP.nms_topk_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                                    jnp.ones(len(boxes), bool), 0.7, 200)
    idx, valid = np.asarray(idx), np.asarray(valid)
    surv = np.argsort(-scores[keep], kind="stable")
    want = np.flatnonzero(keep)[surv][:200]
    assert valid.sum() == min(200, keep.sum())
    np.testing.assert_array_equal(np.sort(idx[valid]), np.sort(want))


def test_pallas_nms_respects_validity():
    boxes, scores = make_cluster_boxes(1024, 13)
    valid = np.arange(1024) % 3 != 0
    order = np.argsort(-scores, kind="stable")
    got = np.asarray(NP.nms_mask_pallas_sorted(
        jnp.asarray(boxes[order]), jnp.asarray(valid[order]), 0.5))
    assert not np.any(got & ~valid[order])
    sub = np_greedy_nms(boxes[valid], scores[valid], 0.5)
    got_orig = np.zeros(1024, bool)
    got_orig[order] = got
    np.testing.assert_array_equal(got_orig[valid], sub)


def test_pallas_nms_topk_presorted_matches():
    """presorted=True on top_k-ordered input == the argsort path, with
    invalid rows interspersed (the RPN _select_level calling pattern)."""
    boxes, scores = make_cluster_boxes(1024, 17)
    valid = np.arange(1024) % 5 != 0
    order = np.argsort(-scores, kind="stable")   # what lax.top_k produces
    bs, ss, vs = boxes[order], scores[order], valid[order]
    idx_a, val_a = NP.nms_topk_pallas(jnp.asarray(bs), jnp.asarray(ss),
                                      jnp.asarray(vs), 0.6, 100)
    idx_b, val_b = NP.nms_topk_pallas(jnp.asarray(bs), jnp.asarray(ss),
                                      jnp.asarray(vs), 0.6, 100,
                                      presorted=True)
    np.testing.assert_array_equal(np.asarray(val_a), np.asarray(val_b))
    np.testing.assert_array_equal(np.asarray(idx_a)[np.asarray(val_a)],
                                  np.asarray(idx_b)[np.asarray(val_b)])
