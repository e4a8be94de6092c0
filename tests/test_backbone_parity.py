"""Numeric forward parity of the ResNet backbone against the REFERENCE'S OWN
torch module (modeling/backbone/resnet.py there), loaded with its `_C`-bound
imports stubbed and yacs shimmed onto our compatible CfgNode.

This anchors the largest numerics surface end to end: random reference
weights are converted through utils/c2_loading.torch_to_flax (the same path
real checkpoints take) and the NHWC flax backbone must reproduce the torch
NCHW feature maps — stem conv + FrozenBN folding + every bottleneck block +
stage layout, in one comparison.
"""

import importlib.util
import os
import sys
import types

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/maskrcnn_benchmark"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not available")


def _load(alias, rel):
    spec = importlib.util.spec_from_file_location(alias, os.path.join(REF, rel))
    m = importlib.util.module_from_spec(spec)
    sys.modules[alias] = m
    spec.loader.exec_module(m)
    return m


@pytest.fixture(scope="module")
def ref_resnet():
    """Reference resnet module + config, with _C-bound layers stubbed."""
    sys.path.insert(0, os.path.dirname(REF))
    from da_detect_tpu.config.node import CfgNode
    yacs = types.ModuleType("yacs")
    yacs_cfg = types.ModuleType("yacs.config")
    yacs_cfg.CfgNode = CfgNode
    yacs.config = yacs_cfg
    sys.modules.setdefault("yacs", yacs)
    sys.modules.setdefault("yacs.config", yacs_cfg)

    bn = _load("_bp_bn", "layers/batch_norm.py")
    misc = _load("_bp_misc", "layers/misc.py")
    stub = types.ModuleType("maskrcnn_benchmark.layers")
    stub.FrozenBatchNorm2d = bn.FrozenBatchNorm2d
    stub.Conv2d = misc.Conv2d

    class _Unavailable:
        def __init__(self, *a, **k):
            raise RuntimeError("_C-bound layer stubbed out for parity test")

    for name in ("DFConv2d", "ROIAlign", "ROIPool", "ConvTranspose2d",
                 "interpolate", "nms"):
        if not hasattr(stub, name):
            setattr(stub, name, getattr(misc, name, _Unavailable))
    sys.modules["maskrcnn_benchmark.layers"] = stub

    import maskrcnn_benchmark  # noqa: F401  (parent package, plain __init__)
    resnet = _load("_bp_resnet", "modeling/backbone/resnet.py")
    from maskrcnn_benchmark.config import cfg
    return resnet, cfg


def _to_flax(state_np):
    from da_detect_tpu.utils.c2_loading import torch_to_flax
    params, frozen, unmatched = torch_to_flax(state_np)
    assert not unmatched, f"converter missed keys: {unmatched[:8]}"
    return params, frozen


def test_resnet50_c4_body_parity(ref_resnet):
    resnet, ref_cfg = ref_resnet
    cfg_t = ref_cfg.clone()
    torch.manual_seed(0)
    model_t = resnet.ResNet(cfg_t)          # R-50-C4 body (stages 1-3)
    model_t.eval()

    state_np = {f"backbone.body.{k}": v.numpy()
                for k, v in model_t.state_dict().items()}
    params, frozen = _to_flax(state_np)

    from da_detect_tpu.config import get_cfg
    from da_detect_tpu.models.backbone import build_backbone
    cfg_j = get_cfg()
    cfg_j.TPU.COMPUTE_DTYPE = "float32"
    assert cfg_j.MODEL.BACKBONE.CONV_BODY == "R-50-C4"
    backbone, _ = build_backbone(cfg_j)

    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        want = model_t(torch.from_numpy(x))[0].numpy()       # [B,1024,4,6]

    x_nhwc = np.ascontiguousarray(x.transpose(0, 2, 3, 1))
    init = backbone.init(jax.random.PRNGKey(0), x_nhwc)
    assert jax.tree_util.tree_structure(init["params"]) == \
        jax.tree_util.tree_structure({"body": params["backbone"]["body"]})
    got = backbone.apply({"params": {"body": params["backbone"]["body"]},
                          "frozen": {"body": frozen["backbone"]["body"]}},
                         x_nhwc)[0]
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_resnet_head_res5_parity(ref_resnet):
    """The C4 box-head trunk (res5 / layer4) against the reference
    ResNetHead — the feature extractor both the detector and the DA
    instance losses consume."""
    resnet, _ = ref_resnet
    torch.manual_seed(2)
    stage = resnet.StageSpec(index=4, block_count=3, return_features=False)
    head_t = resnet.ResNetHead(
        block_module="BottleneckWithFixedBatchNorm", stages=(stage,),
        num_groups=1, width_per_group=64, stride_in_1x1=True,
        stride_init=None, res2_out_channels=256, dilation=1)
    head_t.eval()

    state_np = {
        f"roi_heads.box.feature_extractor.head.{k}": v.numpy()
        for k, v in head_t.state_dict().items()}
    params, frozen = _to_flax(state_np)

    import jax.numpy as jnp
    from da_detect_tpu.models.backbone.resnet import ResNetHead
    head_j = ResNetHead(dtype=jnp.float32)

    rng = np.random.RandomState(3)
    # pooled ROI features: [R, 14, 14, 1024] (torch side: [R, 1024, 14, 14])
    pooled = rng.randn(4, 14, 14, 1024).astype(np.float32)
    with torch.no_grad():
        want = head_t(torch.from_numpy(
            pooled.transpose(0, 3, 1, 2))).numpy()           # [R,2048,7,7]

    variables = {"params": params["feature_extractor"]["head"],
                 "frozen": frozen["feature_extractor"]["head"]}
    got = head_j.apply(variables, jnp.asarray(pooled))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_resnet50_fpn_backbone_parity(ref_resnet):
    """R-50-FPN: body + lateral/output convs + P6 maxpool against the
    reference's own fpn.py composition (build_resnet_fpn_backbone there)."""
    resnet, ref_cfg = ref_resnet
    fpn_mod = _load("_bp_fpn", "modeling/backbone/fpn.py")
    import collections
    from torch import nn

    cfg_t = ref_cfg.clone()
    cfg_t.MODEL.BACKBONE.CONV_BODY = "R-50-FPN"
    torch.manual_seed(4)
    body_t = resnet.ResNet(cfg_t)

    def conv_block(in_ch, out_ch, k, stride=1):
        conv = nn.Conv2d(in_ch, out_ch, k, stride=stride, padding=k // 2)
        nn.init.kaiming_uniform_(conv.weight, a=1)
        nn.init.constant_(conv.bias, 0)
        return conv

    fpn_t = fpn_mod.FPN(in_channels_list=[256, 512, 1024, 2048],
                        out_channels=256, conv_block=conv_block,
                        top_blocks=fpn_mod.LastLevelMaxPool())
    model_t = nn.Sequential(collections.OrderedDict(
        [("body", body_t), ("fpn", fpn_t)]))
    model_t.eval()

    state_np = {f"backbone.{k}": v.numpy()
                for k, v in model_t.state_dict().items()}
    params, frozen = _to_flax(state_np)

    from da_detect_tpu.config import get_cfg
    from da_detect_tpu.models.backbone import build_backbone
    cfg_j = get_cfg()
    cfg_j.TPU.COMPUTE_DTYPE = "float32"
    cfg_j.MODEL.BACKBONE.CONV_BODY = "R-50-FPN"
    cfg_j.MODEL.BACKBONE.OUT_CHANNELS = 256
    backbone, _ = build_backbone(cfg_j)

    rng = np.random.RandomState(5)
    x = rng.randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        want = model_t(torch.from_numpy(x))

    x_nhwc = np.ascontiguousarray(x.transpose(0, 2, 3, 1))
    got = backbone.apply({"params": params["backbone"],
                          "frozen": frozen["backbone"]}, x_nhwc)
    assert len(got) == len(want) == 5  # P2..P5 + P6 maxpool
    for lvl, (g, w) in enumerate(zip(got, want)):
        g = np.asarray(g).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(g, w.numpy(), rtol=1e-4, atol=1e-4,
                                   err_msg=f"FPN level {lvl}")
