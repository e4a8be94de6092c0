"""Registry sweeps (reference tests/test_backbones.py, test_rpn_heads.py,
test_feature_extractors.py, test_predictors.py, test_fbnet.py): build every
registered variant from a mapped config and forward random tensors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from da_detect_tpu.config import get_cfg
from da_detect_tpu.models.backbone import BACKBONES, build_backbone
from da_detect_tpu.models.box_head import (make_box_feature_extractor,
                                           make_box_predictor)

RESNET_BODIES = sorted(k for k in BACKBONES if k.startswith(("R-", "X-")))


def _cfg_for_body(body):
    cfg = get_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.BACKBONE.CONV_BODY = body
    if "X-101" in body:
        cfg.MODEL.RESNETS.NUM_GROUPS = 32
        cfg.MODEL.RESNETS.WIDTH_PER_GROUP = 8
    if "FPN" in body:
        cfg.MODEL.BACKBONE.OUT_CHANNELS = 256
    # keep it small: R-152 etc. still build, depth is config-driven
    return cfg


@pytest.mark.parametrize("body", [b for b in RESNET_BODIES
                                  if "50" in b or "X-101" in b])
def test_backbone_registry(body):
    cfg = _cfg_for_body(body)
    module, spec = build_backbone(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3)
                    .astype(np.float32))
    variables = module.init(jax.random.PRNGKey(0), x)
    feats = module.apply(variables, x)
    assert len(feats) == len(spec.strides)
    for f, s in zip(feats, spec.strides):
        assert f.shape[1] == max(64 // s, 1), (body, f.shape, s)
        assert f.shape[-1] == spec.out_channels or not body.endswith("FPN")


def test_deep_backbones_build():
    """R-101/R-152 construct correctly (no forward to keep tests fast)."""
    for body in ("R-101-C4", "R-152-FPN"):
        cfg = _cfg_for_body(body)
        module, spec = build_backbone(cfg)
        x = jnp.zeros((1, 32, 32, 3))
        variables = jax.eval_shape(
            lambda: module.init(jax.random.PRNGKey(0), x))
        assert variables["params"]


def test_vgg_backbone():
    cfg = get_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.BACKBONE.CONV_BODY = "VGG-16"
    module, spec = build_backbone(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3)
                    .astype(np.float32))
    variables = module.init(jax.random.PRNGKey(0), x)
    feats = module.apply(variables, x)
    assert feats[0].shape == (1, 4, 4, 512)
    assert spec.strides == (16,)


@pytest.mark.parametrize("arch", ["default", "xirb16d_dsmask",
                                  "mobilenet_v2", "cham_v1a", "cham_v2"])
def test_fbnet_backbone(arch):
    cfg = get_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.BACKBONE.CONV_BODY = "FBNet"
    cfg.MODEL.FBNET.ARCH = arch
    cfg.MODEL.FBNET.WIDTH_DIVISOR = 8
    module, spec = build_backbone(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3)
                    .astype(np.float32))
    variables = module.init(jax.random.PRNGKey(0), x)
    feats = module.apply(variables, x)
    assert feats[0].shape == (1, 4, 4, spec.out_channels)


def test_fbnet_heads_build_and_run():
    """FBNet.rpn_head / FBNet.roi_head (the names the reference fbnet
    configs select) produce correctly-shaped outputs."""
    from da_detect_tpu.models.backbone.fbnet import (make_fbnet_roi_head,
                                                     make_fbnet_rpn_head)
    cfg = get_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.FBNET.WIDTH_DIVISOR = 8
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 6
    cfg.MODEL.ROI_BOX_HEAD.POOLER_SCALES = (0.0625,)
    rng = np.random.RandomState(1)
    feats = [jnp.asarray(rng.randn(2, 8, 8, 96).astype(np.float32))]

    rpn = make_fbnet_rpn_head(cfg, num_anchors=15, dtype=jnp.float32)
    v = rpn.init(jax.random.PRNGKey(0), feats)
    logits, deltas = rpn.apply(v, feats)
    assert logits[0].shape == (2, 8, 8, 15)
    assert deltas[0].shape == (2, 8, 8, 60)

    roi, out_ch = make_fbnet_roi_head(cfg, jnp.float32)
    rois = jnp.asarray(rng.uniform(0, 100, (2, 5, 4)).astype(np.float32))
    rois = rois.at[..., 2:].set(rois[..., :2] + 32)
    v = roi.init(jax.random.PRNGKey(0), feats, rois)
    out = roi.apply(v, feats, rois)
    assert out.shape[:2] == (2, 5) and out.shape[-1] == out_ch == 240


EXTRACTORS = [
    ("ResNet50Conv5ROIFeatureExtractor", "R-50-C4", (0.0625,), 14),
    ("FPN2MLPFeatureExtractor", "R-50-FPN", (0.25, 0.125, 0.0625, 0.03125), 7),
    ("FPNXconv1fcFeatureExtractor", "R-50-FPN", (0.25, 0.125, 0.0625, 0.03125), 7),
]


@pytest.mark.parametrize("name,body,scales,res", EXTRACTORS)
def test_feature_extractor_registry(name, body, scales, res):
    cfg = _cfg_for_body(body)
    cfg.MODEL.ROI_BOX_HEAD.FEATURE_EXTRACTOR = name
    cfg.MODEL.ROI_BOX_HEAD.POOLER_SCALES = scales
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = res
    ext, out_dim = make_box_feature_extractor(cfg, jnp.float32)
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(1, int(64 * s), int(64 * s),
                                   1024 if len(scales) == 1 else 256)
                         .astype(np.float32)) for s in scales]
    rois = jnp.asarray(rng.uniform(0, 50, (1, 8, 4)).astype(np.float32))
    rois = rois.at[..., 2:].set(rois[..., :2] + 10)
    variables = ext.init(jax.random.PRNGKey(0), feats, rois)
    out = ext.apply(variables, feats, rois)
    assert out.shape[:2] == (1, 8)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("name", ["FastRCNNPredictor", "FPNPredictor"])
def test_predictor_registry(name):
    cfg = get_cfg()
    cfg.MODEL.ROI_BOX_HEAD.PREDICTOR = name
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 7
    pred = make_box_predictor(cfg, jnp.float32)
    rng = np.random.RandomState(0)
    x = (jnp.asarray(rng.randn(1, 8, 7, 7, 2048).astype(np.float32))
         if name == "FastRCNNPredictor"
         else jnp.asarray(rng.randn(1, 8, 1024).astype(np.float32)))
    variables = pred.init(jax.random.PRNGKey(0), x)
    logits, deltas = pred.apply(variables, x)
    assert logits.shape == (1, 8, 7)
    assert deltas.shape == (1, 8, 28)


def test_dcn_backbone_forward():
    """stage_with_dcn actually wires deformable conv (the reference's dcn
    configs are broken — SURVEY §7.4)."""
    cfg = _cfg_for_body("R-50-C4")
    cfg.MODEL.RESNETS.STAGE_WITH_DCN = (False, False, True, False)
    cfg.MODEL.RESNETS.WITH_MODULATED_DCN = True
    module, _ = build_backbone(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3)
                    .astype(np.float32))
    variables = module.init(jax.random.PRNGKey(0), x)
    # zero-init offsets -> DCN starts as a plain conv; check params exist
    p = variables["params"]["body"]["layer3"]["block0"]["conv2"]
    assert "conv_offset" in p
    feats = module.apply(variables, x)
    assert np.all(np.isfinite(np.asarray(feats[0])))


def test_fbnet_mask_extractor_upsamples_to_resolution():
    """The fbnet mask stage's -2 strides upsample pooled 6x6 ROIs to the
    12x12 mask RESOLUTION the fbnet mask configs declare."""
    from da_detect_tpu.models.backbone.fbnet import make_fbnet_mask_extractor
    cfg = get_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.FBNET.WIDTH_DIVISOR = 8
    cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION = 6
    cfg.MODEL.ROI_MASK_HEAD.POOLER_SCALES = (0.0625,)
    ext = make_fbnet_mask_extractor(cfg, jnp.float32)
    rng = np.random.RandomState(2)
    feats = [jnp.asarray(rng.randn(1, 8, 8, 96).astype(np.float32))]
    rois = jnp.asarray([[[0, 0, 64, 64], [8, 8, 90, 100]]], jnp.float32)
    v = ext.init(jax.random.PRNGKey(0), feats, rois)
    out = ext.apply(v, feats, rois)
    assert out.shape[:2] == (1, 2) and out.shape[2:4] == (12, 12)
