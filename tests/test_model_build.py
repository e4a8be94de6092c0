"""Config-driven model build + forward smoke tests (the reference's
tests/test_detectors.py strategy: build from yaml, run tiny random forward
on CPU — SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from da_detect_tpu.config import get_cfg
from da_detect_tpu.models import DAState, build_detection_model
from da_detect_tpu.structures.image_batch import ImageBatch, Targets


def tiny_cfg(**overrides):
    cfg = get_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 9
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 200
    cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN = 64
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 100
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 32
    cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TRAIN = 64
    cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 32
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.TEST.DETECTIONS_PER_IMG = 8
    for k, v in overrides.items():
        cfg.merge_from_list([k, v])
    return cfg


def fpn_cfg(cfg):
    cfg.MODEL.RPN.USE_FPN = True
    cfg.MODEL.RPN.ANCHOR_STRIDE = (4, 8, 16, 32, 64)
    cfg.MODEL.ROI_HEADS.USE_FPN = True
    cfg.MODEL.ROI_BOX_HEAD.FEATURE_EXTRACTOR = "FPN2MLPFeatureExtractor"
    cfg.MODEL.ROI_BOX_HEAD.PREDICTOR = "FPNPredictor"
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.ROI_BOX_HEAD.POOLER_SCALES = (0.25, 0.125, 0.0625, 0.03125)
    cfg.MODEL.BACKBONE.OUT_CHANNELS = 256
    return cfg


def make_batch(b, h=128, w=160, g=5, seed=0, is_source=True, num_classes=9):
    rng = np.random.RandomState(seed)
    images = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
    sizes = jnp.asarray(np.tile([[h - 8, w - 12]], (b, 1)).astype(np.int32))
    x1 = rng.uniform(0, w - 30, (b, g)); y1 = rng.uniform(0, h - 30, (b, g))
    boxes = np.stack([x1, y1, x1 + rng.uniform(8, 25, (b, g)),
                      y1 + rng.uniform(8, 25, (b, g))], -1)
    batch = ImageBatch(images=images, sizes=sizes, orig_sizes=sizes,
                       is_source=jnp.full((b,), is_source))
    targets = Targets(boxes=jnp.asarray(boxes.astype(np.float32)),
                      labels=jnp.asarray(rng.randint(1, num_classes, (b, g))),
                      valid=jnp.asarray(rng.rand(b, g) > 0.2))
    return batch, targets


TRAIN_RNGS = {"params": jax.random.PRNGKey(0),
              "sampling": jax.random.PRNGKey(1),
              "dropout": jax.random.PRNGKey(2)}
APPLY_RNGS = {"sampling": jax.random.PRNGKey(3),
              "dropout": jax.random.PRNGKey(4)}


@pytest.mark.parametrize("body", ["R-50-C4", "R-50-FPN"])
def test_eval_forward(body):
    cfg = tiny_cfg()
    cfg.MODEL.BACKBONE.CONV_BODY = body
    if body.endswith("FPN"):
        fpn_cfg(cfg)
    model = build_detection_model(cfg)
    batch, _ = make_batch(2)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch)
    dets = model.apply(variables, batch)
    assert dets.boxes.shape[0] == 2
    assert np.all(np.isfinite(np.asarray(dets.boxes)))
    assert np.asarray(dets.scores).max() <= 1.0


def test_train_forward_source_only():
    cfg = tiny_cfg()
    model = build_detection_model(cfg)
    batch, targets = make_batch(2)
    da_state = DAState.create()
    variables = model.init(TRAIN_RNGS, batch, targets, da_state,
                           method=model.train_forward)
    losses, _ = model.apply(variables, batch, targets, da_state,
                            method=model.train_forward, rngs=APPLY_RNGS)
    for k in ["loss_objectness", "loss_rpn_box_reg", "loss_classifier",
              "loss_box_reg"]:
        assert np.isfinite(float(losses[k])), (k, losses[k])
    assert "loss_da_image" not in losses


def test_train_forward_da_triplet():
    cfg = tiny_cfg()
    cfg.MODEL.DOMAIN_ADAPTATION_ON = True
    cfg.MODEL.DA_HEADS.DA_CST_LOSS_WEIGHT = 0.1
    cfg.MODEL.DA_HEADS.DA_TRIPLET_INS_WEIGHT = 1.0
    model = build_detection_model(cfg)
    bs, ts = make_batch(1, seed=0, is_source=True)
    bt, tt = make_batch(1, seed=1, is_source=False)
    bn, tn = make_batch(1, seed=2, is_source=False)
    da_state = DAState.create()
    variables = model.init(TRAIN_RNGS, bs, ts, da_state, bt, tt, bn, tn,
                           aligned=True, method=model.train_forward)
    losses, new_state = model.apply(
        variables, bs, ts, da_state, bt, tt, bn, tn, aligned=True,
        method=model.train_forward, rngs=APPLY_RNGS)
    expected = {"loss_objectness", "loss_rpn_box_reg", "loss_classifier",
                "loss_box_reg", "loss_da_image", "loss_da_instance",
                "loss_da_consistency", "triplet_loss_image",
                "triplet_loss_instance"}
    assert expected <= set(losses), sorted(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
    assert np.isfinite(float(new_state.last_triplet_img))


def test_train_forward_da_triplet_shared_positive_pool():
    """TPU.SHARE_POSITIVE_POOL reuses the detection pass's pooled target
    features as the aligned triplet's positive member — same loss surface,
    one fewer ROI-head pass."""
    cfg = tiny_cfg()
    cfg.MODEL.DOMAIN_ADAPTATION_ON = True
    cfg.MODEL.DA_HEADS.DA_TRIPLET_INS_WEIGHT = 1.0
    cfg.TPU.SHARE_POSITIVE_POOL = True
    model = build_detection_model(cfg)
    cfg_ref = cfg.clone()
    cfg_ref.TPU.SHARE_POSITIVE_POOL = False
    model_ref = build_detection_model(cfg_ref)
    bs, ts = make_batch(1, seed=0, is_source=True)
    bt, tt = make_batch(1, seed=1, is_source=False)
    bn, tn = make_batch(1, seed=2, is_source=False)
    da_state = DAState.create()
    # same param structure either way -> share one variables dict
    variables = model.init(TRAIN_RNGS, bs, ts, da_state, bt, tt, bn, tn,
                           aligned=True, method=model.train_forward)
    losses, _ = model.apply(
        variables, bs, ts, da_state, bt, tt, bn, tn, aligned=True,
        method=model.train_forward, rngs=APPLY_RNGS)
    assert "triplet_loss_instance" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
    # the fast path must actually engage: with identical rngs/params the
    # shared positive member consumes one fewer sampling draw than the
    # independent re-pool, so the triplet loss must diverge from the
    # reference-exact model's
    losses_ref, _ = model_ref.apply(
        variables, bs, ts, da_state, bt, tt, bn, tn, aligned=True,
        method=model_ref.train_forward, rngs=APPLY_RNGS)
    assert (float(losses["triplet_loss_instance"])
            != float(losses_ref["triplet_loss_instance"]))


def test_block_diag_grouped_conv_matches_native():
    """The block-diagonal dense lowering of small-group ResNeXt convs is
    algebraically exact and shares the native param layout."""
    from da_detect_tpu.models.backbone.resnet import Bottleneck

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 10, 64).astype(np.float32))
    kwargs = dict(bottleneck_channels=32, out_channels=64, num_groups=4,
                  norm="gn")
    native = Bottleneck(grouped_dense_max_width=0, **kwargs)
    dense = Bottleneck(grouped_dense_max_width=16, **kwargs)
    variables = native.init(jax.random.PRNGKey(0), x)
    y_native = native.apply(variables, x)
    y_dense = dense.apply(variables, x)  # same params, different lowering
    np.testing.assert_allclose(np.asarray(y_dense), np.asarray(y_native),
                               rtol=1e-5, atol=1e-5)


def test_remat_preserves_losses_and_params():
    """TPU.REMAT_* wraps bottleneck blocks in jax.checkpoint: same param
    tree, same losses (it only changes what the backward stores)."""
    losses_by_remat = {}
    for remat, level in ((False, "block"), (True, "block"), (True, "stage")):
        cfg = tiny_cfg()
        cfg.TPU.REMAT_BACKBONE = remat
        cfg.TPU.REMAT_ROI_HEAD = remat
        cfg.TPU.REMAT_LEVEL = level
        model = build_detection_model(cfg)
        batch, targets = make_batch(2)
        da_state = DAState.create()
        variables = model.init(TRAIN_RNGS, batch, targets, da_state,
                               method=model.train_forward)
        if remat:
            assert jax.tree_util.tree_structure(variables["params"]) == struct0
        else:
            struct0 = jax.tree_util.tree_structure(variables["params"])  # noqa: F841
        def total(params):
            losses, _ = model.apply(
                {**variables, "params": params}, batch, targets, da_state,
                method=model.train_forward, rngs=APPLY_RNGS)
            return sum(losses.values()), losses

        (tot, losses), grads = jax.value_and_grad(total, has_aux=True)(
            variables["params"])
        gnorm = float(jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                                   for g in jax.tree_util.tree_leaves(grads))))
        losses_by_remat[(remat, level)] = (
            {k: float(v) for k, v in losses.items()}, gnorm)
    ref, ref_gnorm = losses_by_remat[(False, "block")]
    for variant in ((True, "block"), (True, "stage")):
        got, got_gnorm = losses_by_remat[variant]
        for k, v in ref.items():
            np.testing.assert_allclose(got[k], v, rtol=1e-5,
                                       err_msg=f"{variant} {k}")
        # remat recomputes the same arithmetic in backward -> same gradients
        np.testing.assert_allclose(got_gnorm, ref_gnorm, rtol=1e-4)


def test_train_forward_da_two_domain():
    cfg = tiny_cfg()
    cfg.MODEL.DOMAIN_ADAPTATION_ON = True
    cfg.MODEL.DA_HEADS.TRIPLET_USE = False
    model = build_detection_model(cfg)
    bs, ts = make_batch(2, seed=0, is_source=True)
    bt, tt = make_batch(2, seed=1, is_source=False)
    da_state = DAState.create()
    variables = model.init(TRAIN_RNGS, bs, ts, da_state, bt, tt,
                           method=model.train_forward)
    losses, _ = model.apply(variables, bs, ts, da_state, bt, tt,
                            method=model.train_forward, rngs=APPLY_RNGS)
    assert "loss_da_image" in losses and "loss_da_instance" in losses
    assert "triplet_loss_image" not in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)


def test_train_gradients_flow():
    cfg = tiny_cfg()
    cfg.MODEL.DOMAIN_ADAPTATION_ON = True
    model = build_detection_model(cfg)
    bs, ts = make_batch(1, seed=0, is_source=True)
    bt, tt = make_batch(1, seed=1, is_source=False)
    bn, tn = make_batch(1, seed=2, is_source=False)
    da_state = DAState.create()
    variables = model.init(TRAIN_RNGS, bs, ts, da_state, bt, tt, bn, tn,
                           method=model.train_forward)

    def loss_fn(params):
        losses, _ = model.apply(
            {"params": params, "frozen": variables["frozen"]}, bs, ts,
            da_state, bt, tt, bn, tn, method=model.train_forward,
            rngs=APPLY_RNGS)
        return sum(jnp.asarray(v) for v in losses.values())

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert total > 0


def test_stem_space_to_depth_exact():
    """The s2d stem conv is the same function as the 7x7/s2 conv (identical
    params, same outputs) — MLPerf conv0 transform, resnet.py _StemConv7x7."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from da_detect_tpu.models.backbone.resnet import _StemConv7x7

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32))
    ref = _StemConv7x7(space_to_depth=False)
    s2d = _StemConv7x7(space_to_depth=True)
    variables = ref.init(jax.random.PRNGKey(0), x)
    a = ref.apply(variables, x)
    b = s2d.apply(variables, x)
    assert a.shape == b.shape == (2, 32, 48, 64)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
    # odd sizes fall back to the plain conv
    xo = jnp.asarray(rng.randn(1, 63, 95, 3).astype(np.float32))
    vo = ref.init(jax.random.PRNGKey(1), xo)
    np.testing.assert_allclose(np.asarray(s2d.apply(vo, xo)),
                               np.asarray(ref.apply(vo, xo)),
                               rtol=1e-5, atol=1e-5)
    # gradients w.r.t. the shared [7,7,3,64] kernel agree too
    def loss(fn, v):
        return jnp.sum(fn.apply(v, x) ** 2)
    ga = jax.grad(lambda v: loss(ref, v))(variables)["params"]["kernel"]
    gb = jax.grad(lambda v: loss(s2d, v))(variables)["params"]["kernel"]
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=1e-4, atol=1e-4)
