"""RPN semantics tests: proposal selection invariants, source-only GT
append, source-only supervision, the FPN batch-joint train top-k."""

import jax
import jax.numpy as jnp
import numpy as np

from da_detect_tpu.models.rpn import (Proposals, append_gt_proposals,
                                      rpn_loss, select_proposals)
from da_detect_tpu.ops import box_ops


def setup_level(n_cells=100, a=3, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.uniform(0, 500, n_cells * a)
    y = rng.uniform(0, 300, n_cells * a)
    anchors = np.stack([x, y, x + rng.uniform(20, 80, n_cells * a),
                        y + rng.uniform(20, 80, n_cells * a)], 1)
    return jnp.asarray(anchors.astype(np.float32))


def test_select_proposals_single_level():
    anchors = setup_level()
    b, n = 2, anchors.shape[0]
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(b, n).astype(np.float32))
    deltas = jnp.asarray(0.1 * rng.randn(b, n, 4).astype(np.float32))
    sizes = jnp.asarray([[320.0, 540.0]] * b)
    props = select_proposals(
        [anchors], [logits.reshape(b, 10, 10, 3)],
        [deltas.reshape(b, 10, 10, 12)], sizes,
        pre_nms_top_n=200, post_nms_top_n=50, fpn_post_nms_top_n=50,
        nms_thresh=0.7, min_size=0, is_train=False)
    assert props.boxes.shape == (b, 50, 4)
    bx = np.asarray(props.boxes)
    v = np.asarray(props.valid)
    # clipped to the image
    assert bx[v][:, 0].min() >= 0 and bx[v][:, 2].max() <= 539.0 + 1e-3
    # scores descending per image
    s = np.asarray(props.scores)
    for i in range(b):
        sv = s[i][v[i]]
        assert np.all(np.diff(sv) <= 1e-6)
    # surviving proposals are mutually non-overlapping above the threshold
    for i in range(b):
        kept = bx[i][v[i]]
        if len(kept) < 2:
            continue
        iou = np.asarray(box_ops.box_iou(jnp.asarray(kept), jnp.asarray(kept)))
        iou = iou - np.eye(len(kept))
        assert iou.max() <= 0.7 + 1e-5


def test_append_gt_only_for_source():
    props = Proposals(boxes=jnp.zeros((2, 4, 4)),
                      scores=jnp.full((2, 4), 0.5),
                      valid=jnp.ones((2, 4), bool))
    gt = jnp.asarray(np.random.RandomState(0).rand(2, 3, 4).astype(np.float32))
    gt_valid = jnp.asarray([[True, True, False], [True, True, True]])
    is_source = jnp.asarray([True, False])
    out = append_gt_proposals(props, gt, gt_valid, is_source)
    assert out.boxes.shape == (2, 7, 4)
    v = np.asarray(out.valid)
    # source image: its 2 valid GTs appended; target image: none
    assert v[0].sum() == 4 + 2
    assert v[1].sum() == 4
    # appended GT rows carry objectness 1.0 (reference inference.py:60-72)
    s = np.asarray(out.scores)
    assert s[0, 4] == 1.0 and s[0, 5] == 1.0 and s[0, 6] == 0.0


def test_rpn_loss_source_only():
    anchors = setup_level()
    n = anchors.shape[0]
    rng = np.random.RandomState(2)
    obj = jnp.asarray(rng.randn(2, n).astype(np.float32))
    deltas = jnp.asarray(0.1 * rng.randn(2, n, 4).astype(np.float32))
    gt = jnp.asarray(np.asarray(anchors[None, :5]).repeat(2, axis=0))
    gt_valid = jnp.ones((2, 5), bool)
    sizes = jnp.asarray([[320.0, 540.0]] * 2)
    kw = dict(fg_iou=0.7, bg_iou=0.3, batch_per_image=64,
              positive_fraction=0.5, straddle_thresh=0)
    key = jax.random.PRNGKey(0)
    # both sources vs one source: the target image must contribute nothing
    l2 = rpn_loss(key, anchors, obj, deltas, gt, gt_valid,
                  jnp.asarray([True, True]), sizes, **kw)
    l1 = rpn_loss(key, anchors, obj[:1], deltas[:1], gt[:1], gt_valid[:1],
                  jnp.asarray([True]), sizes[:1], **kw)
    l_mixed = rpn_loss(key, anchors, obj, deltas, gt, gt_valid,
                       jnp.asarray([True, False]), sizes, **kw)
    # mixed-batch loss uses only the source image's anchors; magnitudes are
    # finite and the target contributes no sampled anchors
    for l in (*l2, *l1, *l_mixed):
        assert np.isfinite(float(l))
    # all-target batch has zero supervision
    l0 = rpn_loss(key, anchors, obj, deltas, gt, gt_valid,
                  jnp.asarray([False, False]), sizes, **kw)
    assert float(l0[1]) == 0.0


def test_fpn_train_topk_is_batch_joint():
    """Training FPN selection keeps fpn_post_nms_top_n over the WHOLE batch
    (reference rpn/inference.py:160-163)."""
    anchors = setup_level(n_cells=64)
    b = 2
    n = anchors.shape[0]
    rng = np.random.RandomState(3)
    # image 0 has uniformly higher scores than image 1
    logits = np.concatenate([rng.randn(1, n) + 6.0, rng.randn(1, n) - 6.0])
    deltas = 0.0 * rng.randn(b, n, 4)
    sizes = jnp.asarray([[320.0, 540.0]] * b)
    props = select_proposals(
        [anchors, anchors],
        [jnp.asarray(logits.astype(np.float32)).reshape(b, 8, 8, 3)] * 2,
        [jnp.asarray(deltas.astype(np.float32)).reshape(b, 8, 8, 12)] * 2,
        sizes, pre_nms_top_n=100, post_nms_top_n=40, fpn_post_nms_top_n=40,
        nms_thresh=0.9, min_size=0, is_train=True)
    v = np.asarray(props.valid)
    # the joint top-40 threshold comes from image 0's scores, so image 1
    # keeps (almost) nothing
    assert v[0].sum() > 0
    assert v[1].sum() < 5
    assert v.sum() <= 40 + 5  # ties tolerance
