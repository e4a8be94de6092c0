"""Load the reference's COMPLETE GeneralizedRCNN stack for composed-pipeline
parity tests.

Unlike the per-module stubs in test_backbone_parity / test_da_reference_parity,
this imports the real ``maskrcnn_benchmark`` package wholesale from
/root/reference with:

* ``maskrcnn_benchmark._C`` bound to the reference's OWN compiled CPU kernels
  (csrc/cpu/nms_cpu.cpp + ROIAlign_cpu.cpp via torch cpp_extension — the same
  code its GPU build dispatches to on CPU tensors),
* ``yacs`` shimmed onto our compatible CfgNode (yacs is not installed here),
* ``torchvision.utils.save_image`` stubbed (imported by two DA-head modules
  that the eval path never calls),
* ``torch._six`` restored as an attribute (removed in torch>=2; only
  ``PY37`` is read, by utils/imports.py).

Everything is loaded inside a sys.modules sandbox and restored afterwards so
the other parity tests' per-module stubs are unaffected.

API-drift patches applied to the in-memory csrc sources are one-liners
(`.type()` dispatch macros), identical to test_roi_align_reference_kernel.
"""

from __future__ import annotations

import contextlib
import os
import sys
import types

import numpy as np

REF = "/root/reference/maskrcnn_benchmark"
REF_ROOT = os.path.dirname(REF)

_SANDBOX_PREFIXES = ("maskrcnn_benchmark", "yacs", "torchvision")


def _compile_ref_C():
    """Compile the reference's own CPU nms + ROIAlign into a ``_C`` stub."""
    import torch
    from torch.utils.cpp_extension import load_inline

    def _patch(src):
        # API drift only — kernel bodies untouched
        src = src.replace("input.type().is_cuda()", "input.is_cuda()")
        src = src.replace("rois.type().is_cuda()", "rois.is_cuda()")
        src = src.replace("dets.type().is_cuda()", "dets.is_cuda()")
        src = src.replace("AT_DISPATCH_FLOATING_TYPES(input.type(),",
                          "AT_DISPATCH_FLOATING_TYPES(input.scalar_type(),")
        src = src.replace("AT_DISPATCH_FLOATING_TYPES(dets.type(),",
                          "AT_DISPATCH_FLOATING_TYPES(dets.scalar_type(),")
        src = src.replace('#include "cpu/vision.h"', "")
        return src

    nms_src = _patch(open(os.path.join(REF, "csrc/cpu/nms_cpu.cpp")).read())
    ra_src = _patch(open(os.path.join(REF, "csrc/cpu/ROIAlign_cpu.cpp")).read())
    mod = load_inline(name="ref_pipeline_C",
                      cpp_sources=[nms_src + "\n" + ra_src],
                      functions=["nms_cpu", "ROIAlign_forward_cpu"],
                      extra_cflags=["-O2"], verbose=False)

    _C = types.ModuleType("maskrcnn_benchmark._C")
    _C.nms = mod.nms_cpu
    _C.roi_align_forward = mod.ROIAlign_forward_cpu

    def _unavailable(*a, **k):
        raise NotImplementedError(
            "only the eval-forward kernels are compiled for parity tests")

    for name in ("roi_align_backward", "roi_pool_forward", "roi_pool_backward",
                 "sigmoid_focalloss_forward", "sigmoid_focalloss_backward",
                 "deform_conv_forward", "deform_conv_backward_input",
                 "deform_conv_backward_parameters",
                 "modulated_deform_conv_forward",
                 "modulated_deform_conv_backward",
                 "deform_psroi_pooling_forward",
                 "deform_psroi_pooling_backward"):
        setattr(_C, name, _unavailable)
    return _C


@contextlib.contextmanager
def reference_model_stack():
    """Context manager yielding the imported reference package modules:
    (config_cfg_template, build_detection_model, to_image_list)."""
    saved = {k: v for k, v in sys.modules.items()
             if k.split(".")[0] in _SANDBOX_PREFIXES}
    for k in list(saved):
        del sys.modules[k]
    path_added = REF_ROOT not in sys.path
    if path_added:
        sys.path.insert(0, REF_ROOT)

    import torch
    six_was = getattr(torch, "_six", None)
    # CPU fix: the DA losses cast labels with
    # ``.type(torch.cuda.FloatTensor)`` (da_heads/loss.py:99,172), which
    # needs a CUDA build; alias it to the CPU tensor type (same math,
    # Tensor.type accepts either class) and restore on exit.
    cuda_ft_was = torch.cuda.__dict__.get("FloatTensor")
    torch.cuda.FloatTensor = torch.FloatTensor
    _np_aliases = []
    try:
        # ---- shims ----
        from da_detect_tpu.config.node import CfgNode
        yacs = types.ModuleType("yacs")
        yacs_cfg = types.ModuleType("yacs.config")
        yacs_cfg.CfgNode = CfgNode
        yacs.config = yacs_cfg
        sys.modules["yacs"] = yacs
        sys.modules["yacs.config"] = yacs_cfg

        tv = types.ModuleType("torchvision")
        tv_utils = types.ModuleType("torchvision.utils")
        tv_utils.save_image = lambda *a, **k: None
        tv.utils = tv_utils
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tv_utils

        if not hasattr(torch, "_six"):
            torch._six = types.SimpleNamespace(PY37=True, PY3=True)

        # numpy removed the deprecated builtin aliases the 2019-era reference
        # uses (np.float in anchor_generator.py:231); restore them scoped
        for alias, builtin in (("float", float), ("int", int),
                               ("bool", bool), ("object", object)):
            if not hasattr(np, alias):
                setattr(np, alias, builtin)
                _np_aliases.append(alias)

        _C = _compile_ref_C()
        sys.modules["maskrcnn_benchmark._C"] = _C

        import maskrcnn_benchmark
        maskrcnn_benchmark._C = _C

        from maskrcnn_benchmark.config import cfg as ref_cfg
        from maskrcnn_benchmark.modeling.detector import build_detection_model
        from maskrcnn_benchmark.structures.image_list import to_image_list

        yield ref_cfg, build_detection_model, to_image_list
    finally:
        if path_added and REF_ROOT in sys.path:
            sys.path.remove(REF_ROOT)
        if six_was is None and hasattr(torch, "_six"):
            del torch._six
        if cuda_ft_was is None:
            torch.cuda.__dict__.pop("FloatTensor", None)
        else:
            torch.cuda.FloatTensor = cuda_ft_was
        for alias in _np_aliases:
            delattr(np, alias)
        for k in [k for k in sys.modules
                  if k.split(".")[0] in _SANDBOX_PREFIXES]:
            del sys.modules[k]
        sys.modules.update(saved)


def randomize_reference_weights(model_t, seed: int):
    """Seeded, detection-meaningful random weights for a reference model.

    Defaults would be degenerate for pipeline parity (cls_score std 0.01 →
    near-uniform softmax ≈ 1/81, every detection below SCORE_THRESH), so the
    heads get enough variance to produce spread scores and distinct NMS
    orderings, while bbox deltas stay small enough not to saturate
    BBOX_XFORM_CLIP.
    """
    import torch

    g = torch.Generator().manual_seed(seed)
    sd = model_t.state_dict()
    new = {}
    for k, v in sd.items():
        if v.dtype not in (torch.float32, torch.float64) or \
                "cell_anchors" in k:  # geometry buffer, not a weight
            new[k] = v
            continue
        if k.endswith("running_var"):
            new[k] = torch.rand(v.shape, generator=g) * 0.5 + 0.75
        elif k.endswith("running_mean"):
            new[k] = torch.randn(v.shape, generator=g) * 0.1
        elif "cls_score" in k or "cls_logits" in k:
            new[k] = torch.randn(v.shape, generator=g) * 0.3
        elif "bbox_pred" in k:
            new[k] = torch.randn(v.shape, generator=g) * 0.02
        elif k.endswith(".bias"):
            # positive-leaning: fully-dead ReLU cells collapse head logits
            # to the bias, creating exact score ties that make NMS keep-set
            # comparison ill-posed (tie-breaking is implementation-defined)
            new[k] = torch.randn(v.shape, generator=g).abs() * 0.05 + 0.02
        else:
            new[k] = torch.randn(v.shape, generator=g) * 0.05
    model_t.load_state_dict(new)
    return {k: v.numpy() for k, v in model_t.state_dict().items()}


def calibrate_reference_heads(model_t, img_t, to_image_list):
    """Rescale the randomized heads so logits land in a well-conditioned
    range on THIS input.

    Two failure modes of raw random heads make keep-set comparison
    ill-posed:
    * saturation — objectness exactly 1.0 / softmax exactly tied for dozens
      of rows;
    * per-channel variance collapse — relu'd features have a large positive
      mean component, so a random output row is dominated by a constant
      (w·mean) with cross-position variation of ~1e-5 that collides at
      float32 resolution, producing exact cross-position ties.
    Both make the NMS keep-set implementation-defined (tie-breaking is the
    one legitimate divergence). So each head output channel is standardized
    ACROSS positions/proposals on this input: objectness/class logits to
    std ≈ 2 mean 0, RPN deltas to std 0.25 (decoded boxes stay near anchors
    without degenerating), box-head deltas to std 1 (≈0.1 after the
    (10,10,5,5) coder weights).

    Returns the calibrated numpy state_dict.
    """
    import torch

    def _standardize(mod, mean, std, target):
        # per-output-channel affine: logit' = (logit - mean) * target/std
        s = target / std.clamp(min=1e-3)
        with torch.no_grad():
            mod.weight *= s.view(-1, *([1] * (mod.weight.dim() - 1)))
            mod.bias.copy_((mod.bias - mean) * s)

    with torch.no_grad():
        il = to_image_list([img_t], 32)
        feats = model_t.backbone(il.tensors)
        obj, reg = model_t.rpn.head(feats)
        # [C]-stats across all positions and levels
        oc = torch.cat([o.flatten(2).squeeze(0) for o in obj], dim=-1)
        rc = torch.cat([r.flatten(2).squeeze(0) for r in reg], dim=-1)
        _standardize(model_t.rpn.head.cls_logits,
                     oc.mean(1), oc.std(1), 2.0)
        _standardize(model_t.rpn.head.bbox_pred,
                     rc.mean(1), rc.std(1), 0.25)

        props, _ = model_t.rpn(il, feats, None)
        box = model_t.roi_heads.box
        x = box.feature_extractor(feats, props)
        cls_logit, box_reg = box.predictor(x)
        _standardize(box.predictor.cls_score,
                     cls_logit.mean(0), cls_logit.std(0), 2.0)
        _standardize(box.predictor.bbox_pred,
                     box_reg.mean(0), box_reg.std(0), 1.0)
    return {k: v.numpy() for k, v in model_t.state_dict().items()}
