"""RetinaNet + keypoint/mask head build-and-forward smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np

from da_detect_tpu.config import get_cfg
from da_detect_tpu.models import DAState, build_detection_model
from tests.test_model_build import make_batch, TRAIN_RNGS, APPLY_RNGS


def retinanet_cfg():
    cfg = get_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.RETINANET_ON = True
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN-RETINANET"
    cfg.MODEL.BACKBONE.OUT_CHANNELS = 256
    cfg.MODEL.RETINANET.NUM_CLASSES = 5
    cfg.MODEL.RETINANET.PRE_NMS_TOP_N = 100
    cfg.TEST.DETECTIONS_PER_IMG = 10
    return cfg


def test_retinanet_eval_and_train():
    cfg = retinanet_cfg()
    model = build_detection_model(cfg)
    batch, targets = make_batch(2, h=128, w=160, num_classes=5)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch)
    dets = model.apply(variables, batch)
    assert dets.boxes.shape[0] == 2
    assert np.all(np.isfinite(np.asarray(dets.boxes)))

    losses, _ = model.apply(variables, batch, targets, DAState.create(),
                            method=model.train_forward, rngs=APPLY_RNGS)
    for k in ("loss_retina_cls", "loss_retina_reg"):
        assert np.isfinite(float(losses[k])), (k, losses[k])
    # prior-prob init => early cls loss should be small-ish, not huge
    assert float(losses["loss_retina_cls"]) < 5.0


def test_retinanet_plus_da_is_rejected():
    """RetinaNet has no DA heads (reference parity) — combining the flags
    must fail loudly, not silently train source-only."""
    import pytest

    cfg = retinanet_cfg()
    cfg.MODEL.DOMAIN_ADAPTATION_ON = True
    with pytest.raises(ValueError, match="mutually exclusive"):
        build_detection_model(cfg)


def test_triplet_margin_lr_plumbed():
    """cfg MODEL.DA_HEADS.TRIPLET_MARGIN_LR must reach the DA module (it
    was silently ignored before — the margin schedule ran 100x off)."""
    from da_detect_tpu.models.da import make_da_heads

    cfg = get_cfg()
    cfg.MODEL.DA_HEADS.TRIPLET_MARGIN_LR = 0.123
    mod = make_da_heads(cfg, jnp.float32)
    assert mod.triplet_margin_lr == 0.123


def test_retinanet_approx_topk_candidate_selection():
    """TPU.APPROX_TOPK engages approx_max_k on big levels; the candidate
    scores it returns must come from near the top of the exact ordering."""
    from da_detect_tpu.models.retinanet import retinanet_inference

    rng = np.random.RandomState(0)
    h, w, a, c = 40, 64, 3, 4  # n = 30720 (location, class) pairs > 4k
    logits = [jnp.asarray(rng.randn(1, h, w, a * c).astype(np.float32))]
    regs = [jnp.asarray(rng.randn(1, h, w, a * 4).astype(np.float32) * 0.1)]
    anchors = jnp.asarray(
        np.tile(np.array([[0, 0, 32, 32]], np.float32), (h * w * a, 1))
        + rng.rand(h * w * a, 4).astype(np.float32) * 4)
    sizes = jnp.asarray([[h * 8.0, w * 8.0]])
    kwargs = dict(pre_nms_thresh=0.05, pre_nms_top_n=64, nms_thresh=0.5,
                  detections_per_img=16)
    exact = retinanet_inference([anchors], logits, regs, sizes,
                                approx_topk=False, **kwargs)
    approx = retinanet_inference([anchors], logits, regs, sizes,
                                 approx_topk=True, **kwargs)
    assert np.all(np.isfinite(np.asarray(approx.boxes)))
    # every approx-selected score must be at least the exact 4*k-th score
    ex_scores = np.sort(np.asarray(
        jax.nn.sigmoid(logits[0].reshape(-1, c).reshape(-1))))[::-1]
    floor = ex_scores[4 * kwargs["pre_nms_top_n"]]
    ap_scores = np.asarray(approx.scores)[np.asarray(approx.valid)]
    assert np.all(ap_scores >= floor), (ap_scores.min(), floor)
    # the very top detections agree with the exact path
    np.testing.assert_allclose(np.asarray(approx.scores)[0, :4],
                               np.asarray(exact.scores)[0, :4], rtol=1e-5)


def test_mask_and_keypoint_heads_train():
    from da_detect_tpu.structures.image_batch import Targets
    cfg = get_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.KEYPOINT_ON = True
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 5
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 100
    cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN = 32
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    model = build_detection_model(cfg)
    batch, targets = make_batch(1, h=128, w=160, num_classes=5)
    rng = np.random.RandomState(0)
    g = targets.boxes.shape[1]
    masks = jnp.asarray((rng.rand(1, g, 28, 28) > 0.5).astype(np.float32))
    ctr = (targets.boxes[..., :2] + targets.boxes[..., 2:]) / 2
    kps = jnp.concatenate(
        [jnp.tile(ctr[:, :, None, :], (1, 1, 17, 1)),
         jnp.ones((1, g, 17, 1))], axis=-1)
    targets = Targets(boxes=targets.boxes, labels=targets.labels,
                      valid=targets.valid, masks=masks, keypoints=kps)
    variables = model.init(TRAIN_RNGS, batch, targets, DAState.create(),
                           method=model.train_forward)
    losses, _ = model.apply(variables, batch, targets, DAState.create(),
                            method=model.train_forward, rngs=APPLY_RNGS)
    assert "loss_mask" in losses and "loss_kp" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)


def test_rpn_only():
    cfg = get_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.RPN_ONLY = True
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 100
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 32
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 100
    cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN = 32
    model = build_detection_model(cfg)
    batch, targets = make_batch(1, h=128, w=160)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch)
    dets = model.apply(variables, batch)
    assert dets.boxes.shape[1] == 32
    losses, _ = model.apply(variables, batch, targets, DAState.create(),
                            method=model.train_forward, rngs=APPLY_RNGS)
    assert set(losses) == {"loss_objectness", "loss_rpn_box_reg"}
