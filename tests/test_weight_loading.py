"""Weight-converter tests: synthetic Detectron C2 pickle and torch
maskrcnn-benchmark state dicts -> flax trees, verified by numeric forward
comparison where feasible."""

import pickle

import jax
import numpy as np
import pytest
import torch

from da_detect_tpu.config import get_cfg
from da_detect_tpu.models import build_detection_model
from da_detect_tpu.utils import c2_loading


def make_c2_blobs(rng):
    """Minimal R-50 blob dict (stage shapes)."""
    blobs = {"conv1_w": rng.randn(64, 3, 7, 7).astype(np.float32),
             "res_conv1_bn_s": rng.rand(64).astype(np.float32),
             "res_conv1_bn_b": rng.randn(64).astype(np.float32)}
    stage_specs = [(2, 3, 64, 256), (3, 4, 128, 512), (4, 6, 256, 1024),
                   (5, 3, 512, 2048)]
    in_ch = 64
    for stage, blocks, mid, out in stage_specs:
        for j in range(blocks):
            bi = in_ch if j == 0 else out
            blobs[f"res{stage}_{j}_branch2a_w"] = rng.randn(mid, bi, 1, 1).astype(np.float32)
            blobs[f"res{stage}_{j}_branch2b_w"] = rng.randn(mid, mid, 3, 3).astype(np.float32)
            blobs[f"res{stage}_{j}_branch2c_w"] = rng.randn(out, mid, 1, 1).astype(np.float32)
            for br, ch in (("branch2a", mid), ("branch2b", mid), ("branch2c", out)):
                blobs[f"res{stage}_{j}_{br}_bn_s"] = rng.rand(ch).astype(np.float32)
                blobs[f"res{stage}_{j}_{br}_bn_b"] = rng.randn(ch).astype(np.float32)
            if j == 0:
                blobs[f"res{stage}_{j}_branch1_w"] = rng.randn(out, bi, 1, 1).astype(np.float32)
                blobs[f"res{stage}_{j}_branch1_bn_s"] = rng.rand(out).astype(np.float32)
                blobs[f"res{stage}_{j}_branch1_bn_b"] = rng.randn(out).astype(np.float32)
        in_ch = out
    return blobs


def test_c2_pickle_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    blobs = make_c2_blobs(rng)
    pkl = tmp_path / "R-50.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"blobs": blobs}, f)

    cfg = get_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 100
    cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN = 32
    model = build_detection_model(cfg)
    from tests.test_model_build import make_batch
    batch, _ = make_batch(1, h=64, w=64)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch)

    from da_detect_tpu.utils.checkpoint import Checkpointer
    out = Checkpointer.load_weight_file(str(pkl), dict(variables))

    # stem conv transposed correctly
    np.testing.assert_allclose(
        out["params"]["backbone"]["body"]["stem"]["conv1"]["kernel"],
        blobs["conv1_w"].transpose(2, 3, 1, 0))
    # res5 went to the C4 box head
    np.testing.assert_allclose(
        out["params"]["feature_extractor"]["head"]["layer4"]["block0"]["conv1"]["kernel"],
        blobs["res5_0_branch2a_w"].transpose(2, 3, 1, 0))
    # frozen BN scale applied as-is (pre-folded)
    np.testing.assert_allclose(
        out["frozen"]["backbone"]["body"]["stem"]["bn1"]["scale"],
        blobs["res_conv1_bn_s"])
    # every backbone stage landed
    for i in (1, 2, 3):
        assert f"layer{i}" in out["params"]["backbone"]["body"]


def test_torch_statedict_conversion():
    rng = np.random.RandomState(1)
    state = {
        "module.backbone.body.stem.conv1.weight": torch.tensor(
            rng.randn(64, 3, 7, 7).astype(np.float32)),
        "module.backbone.body.stem.bn1.weight": torch.tensor(np.abs(rng.randn(64)).astype(np.float32)),
        "module.backbone.body.stem.bn1.bias": torch.tensor(rng.randn(64).astype(np.float32)),
        "module.backbone.body.stem.bn1.running_mean": torch.tensor(rng.randn(64).astype(np.float32)),
        "module.backbone.body.stem.bn1.running_var": torch.tensor(np.abs(rng.randn(64)).astype(np.float32) + 0.5),
        "module.rpn.head.conv.weight": torch.tensor(rng.randn(1024, 1024, 3, 3).astype(np.float32)),
        "module.rpn.head.conv.bias": torch.tensor(rng.randn(1024).astype(np.float32)),
        "module.roi_heads.box.predictor.cls_score.weight": torch.tensor(
            rng.randn(9, 2048).astype(np.float32)),
        "module.roi_heads.box.predictor.cls_score.bias": torch.tensor(
            rng.randn(9).astype(np.float32)),
        "module.da_heads.inshead.fc1_da.weight": torch.tensor(
            rng.randn(1024, 2048).astype(np.float32)),
        "module.da_heads.inshead.fc1_da.bias": torch.tensor(
            rng.randn(1024).astype(np.float32)),
    }
    state_np = {k: v.numpy() for k, v in state.items()}
    params, frozen, unmatched = c2_loading.torch_to_flax(state_np)
    assert not unmatched, unmatched
    np.testing.assert_allclose(
        params["backbone"]["body"]["stem"]["conv1"]["kernel"],
        state_np["module.backbone.body.stem.conv1.weight"].transpose(2, 3, 1, 0))
    # frozen bn folded: scale = w / sqrt(var), bias = b - mean*scale
    w = state_np["module.backbone.body.stem.bn1.weight"]
    b = state_np["module.backbone.body.stem.bn1.bias"]
    m = state_np["module.backbone.body.stem.bn1.running_mean"]
    v = state_np["module.backbone.body.stem.bn1.running_var"]
    np.testing.assert_allclose(frozen["backbone"]["body"]["stem"]["bn1"]["scale"],
                               w / np.sqrt(v), rtol=1e-5)
    np.testing.assert_allclose(frozen["backbone"]["body"]["stem"]["bn1"]["bias"],
                               b - m * (w / np.sqrt(v)), rtol=1e-4)
    # linear transposed
    np.testing.assert_allclose(
        params["predictor"]["cls_score"]["kernel"],
        state_np["module.roi_heads.box.predictor.cls_score.weight"].T)
    np.testing.assert_allclose(
        params["da_heads"]["inshead"]["fc1_da"]["kernel"],
        state_np["module.da_heads.inshead.fc1_da.weight"].T)
    # conv bias passes through raw
    np.testing.assert_allclose(params["rpn_head"]["conv"]["bias"],
                               state_np["module.rpn.head.conv.bias"])


def test_fc6_flatten_permutation():
    """fc6 consumes the flattened pooled map: torch flattens (C,H,W), our
    NHWC extractor flattens (H,W,C). The converted kernel must satisfy
    torch_fc6(x_chw.flatten) == flax_fc6(x_hwc.flatten) for any x."""
    rng = np.random.RandomState(7)
    C, R, OUT = 5, 7, 3
    w = rng.randn(OUT, C * R * R).astype(np.float32)
    state = {"roi_heads.box.feature_extractor.fc6.weight": w,
             "roi_heads.box.feature_extractor.fc6.bias":
                 rng.randn(OUT).astype(np.float32)}
    params, _, unmatched = c2_loading.torch_to_flax(state, pool_resolution=R)
    assert not unmatched
    k = params["feature_extractor"]["fc6"]["kernel"]
    x = rng.randn(C, R, R).astype(np.float32)  # CHW as torch pools it
    ref = w @ x.reshape(-1)
    ours = x.transpose(1, 2, 0).reshape(-1) @ k  # HWC as we pool it
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_infer_pool_resolution():
    """R is derived from fc6's input dim / the FPN conv channel count — the
    dangerous case is an R=14 FPN2MLP checkpoint loaded with the R=7
    default: 256*14*14 is divisible by 49, so the old assert passed and the
    kernel was silently mis-permuted (advisor round-3, checkpoint.py:100)."""
    rng = np.random.RandomState(3)
    C, OUT = 256, 8
    for R in (7, 14):
        state = {
            "roi_heads.box.feature_extractor.fc6.weight":
                rng.randn(OUT, C * R * R).astype(np.float32),
            "backbone.fpn.fpn_layer1.weight":
                rng.randn(C, C, 3, 3).astype(np.float32),
        }
        assert c2_loading.infer_pool_resolution(state) == R
    # C4 head (no fc6): resolution is irrelevant -> None
    assert c2_loading.infer_pool_resolution(
        {"backbone.fpn.fpn_layer1.weight": np.zeros((C, C, 3, 3))}) is None
    # no FPN conv to pin C -> not derivable -> None (caller uses cfg value)
    assert c2_loading.infer_pool_resolution(
        {"roi_heads.box.feature_extractor.fc6.weight":
             np.zeros((OUT, C * 49))}) is None


def test_load_weight_file_derives_r14(tmp_path):
    """End-to-end: an R=14 torch checkpoint loaded WITHOUT an explicit
    pool_resolution must still land fc6 with the correct permutation."""
    import torch

    from da_detect_tpu.utils.checkpoint import Checkpointer

    rng = np.random.RandomState(11)
    C, R, OUT = 256, 14, 6
    w = rng.randn(OUT, C * R * R).astype(np.float32)
    state = {
        "roi_heads.box.feature_extractor.fc6.weight": torch.from_numpy(w),
        "backbone.fpn.fpn_layer1.weight":
            torch.from_numpy(rng.randn(C, C, 3, 3).astype(np.float32)),
    }
    path = tmp_path / "ckpt_r14.pth"
    torch.save({"model": state}, str(path))
    variables = {
        "params": {
            "feature_extractor": {"fc6": {
                "kernel": np.zeros((C * R * R, OUT), np.float32)}},
            "backbone": {"fpn": {"fpn_layer1": {
                "kernel": np.zeros((3, 3, C, C), np.float32)}}},
        },
        "frozen": {},
    }
    out = Checkpointer.load_weight_file(str(path), variables)
    k = np.asarray(out["params"]["feature_extractor"]["fc6"]["kernel"])
    x = rng.randn(C, R, R).astype(np.float32)
    ref = w @ x.reshape(-1)
    ours = x.transpose(1, 2, 0).reshape(-1) @ k
    np.testing.assert_allclose(ours, ref, rtol=1e-4)
