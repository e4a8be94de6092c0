"""Pretrained-weight converters: Detectron C2 pickles and torch checkpoints
-> flax variable trees.

Plays the role of reference utils/c2_model_loading.py:13-206 (C2 key rename
table) + utils/model_serialization.py:18-95 (suffix alignment). Parity with
the published numbers depends on identical ImageNet init (SURVEY §3.4).

Layout notes:
* torch convs are OIHW, flax are HWIO -> transpose (2, 3, 1, 0)
* torch Linear is [out, in], flax Dense kernel [in, out] -> transpose
* FrozenBatchNorm folds to scale = weight * rsqrt(running_var),
  bias = bias - running_mean * scale (reference layers/batch_norm.py:20-22 —
  note: no eps). C2 pickles ship pre-folded scale/bias (identity stats).
"""

from __future__ import annotations

import math
import pickle
import re
from typing import Any

import numpy as np


def _conv(w):
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _set(tree: dict, path: list[str], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


_C2_STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}

# branch -> (conv module, bn module)
_BRANCH = {"branch2a": ("conv1", "bn1"), "branch2b": ("conv2", "bn2"),
           "branch2c": ("conv3", "bn3"),
           "branch1": ("downsample_conv", "downsample_bn")}


def load_c2_pickle(path: str):
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    if "blobs" in data:
        data = data["blobs"]
    return data


def c2_resnet_to_flax(blobs: dict, *, c4_head: bool = True):
    """Detectron ImageNet R-50/101/152 blobs -> (params, frozen) trees for
    our ResNet backbone (+ res5 box head when ``c4_head``).

    C2 naming: conv1_w, res_conv1_bn_{s,b}, res{S}_{j}_{branch}_w,
    res{S}_{j}_{branch}_bn_{s,b} with S in 2..5.
    """
    params: dict = {}
    frozen: dict = {}

    _set(params, ["backbone", "body", "stem", "conv1", "kernel"],
         _conv(blobs["conv1_w"]))
    _set(frozen, ["backbone", "body", "stem", "bn1", "scale"],
         blobs["res_conv1_bn_s"])
    _set(frozen, ["backbone", "body", "stem", "bn1", "bias"],
         blobs["res_conv1_bn_b"])

    pat = re.compile(r"^res(\d)_(\d+)_(branch[12][abc]?)_(w|bn_s|bn_b)$")
    for key, val in blobs.items():
        m = pat.match(key)
        if not m:
            continue
        stage, block, branch, kind = int(m.group(1)), int(m.group(2)), m.group(3), m.group(4)
        conv_name, bn_name = _BRANCH[branch]
        if stage <= 4 or not c4_head:
            base = ["backbone", "body", f"layer{stage - 1}", f"block{block}"]
        else:
            base = ["feature_extractor", "head", "layer4", f"block{block}"]
        if kind == "w":
            _set(params, base + [conv_name, "kernel"], _conv(val))
        elif kind == "bn_s":
            _set(frozen, base + [bn_name, "scale"], val)
        else:
            _set(frozen, base + [bn_name, "bias"], val)
    return params, frozen


# ---------------------------------------------------------------------------
# torch (maskrcnn-benchmark) checkpoints
# ---------------------------------------------------------------------------

def _strip_prefix(state: dict) -> dict:
    out = {}
    for k, v in state.items():
        out[k[len("module."):] if k.startswith("module.") else k] = v
    return out


def _fold_frozen_bn(state: dict, prefix: str):
    w = np.asarray(state[prefix + ".weight"], np.float64)
    b = np.asarray(state[prefix + ".bias"], np.float64)
    mean = np.asarray(state.get(prefix + ".running_mean", np.zeros_like(w)), np.float64)
    var = np.asarray(state.get(prefix + ".running_var", np.ones_like(w)), np.float64)
    scale = w / np.sqrt(var)
    return (scale.astype(np.float32), (b - mean * scale).astype(np.float32))


_TORCH_RENAMES = [
    # (torch regex, flax path template; {g} groups)
    (r"^backbone\.body\.stem\.conv1\.weight$", "p:backbone/body/stem/conv1/kernel:conv"),
    (r"^backbone\.body\.layer(\d)\.(\d+)\.conv(\d)\.weight$",
     "p:backbone/body/layer{0}/block{1}/conv{2}/kernel:conv"),
    (r"^backbone\.body\.layer(\d)\.(\d+)\.downsample\.0\.weight$",
     "p:backbone/body/layer{0}/block{1}/downsample_conv/kernel:conv"),
    (r"^backbone\.fpn\.fpn_inner(\d)\.weight$", "p:backbone/fpn/fpn_inner{0}/kernel:conv"),
    (r"^backbone\.fpn\.fpn_inner(\d)\.bias$", "p:backbone/fpn/fpn_inner{0}/bias:raw"),
    (r"^backbone\.fpn\.fpn_layer(\d)\.weight$", "p:backbone/fpn/fpn_layer{0}/kernel:conv"),
    (r"^backbone\.fpn\.fpn_layer(\d)\.bias$", "p:backbone/fpn/fpn_layer{0}/bias:raw"),
    (r"^rpn\.head\.conv\.(weight|bias)$", "p:rpn_head/conv/{w01}:{cw01}"),
    (r"^rpn\.head\.cls_logits\.(weight|bias)$", "p:rpn_head/cls_logits/{w01}:{cw01}"),
    (r"^rpn\.head\.bbox_pred\.(weight|bias)$", "p:rpn_head/bbox_pred/{w01}:{cw01}"),
    (r"^roi_heads\.box\.feature_extractor\.head\.layer4\.(\d+)\.conv(\d)\.weight$",
     "p:feature_extractor/head/layer4/block{0}/conv{1}/kernel:conv"),
    (r"^roi_heads\.box\.feature_extractor\.head\.layer4\.(\d+)\.downsample\.0\.weight$",
     "p:feature_extractor/head/layer4/block{0}/downsample_conv/kernel:conv"),
    # fc6 consumes the FLATTENED pooled map: torch flattens NCHW -> (C,H,W)
    # but our NHWC extractor flattens (H,W,C), so fc6's input dim must be
    # permuted, not just transposed (fc7 and the predictors take 1-D
    # features — plain transpose is correct there)
    (r"^roi_heads\.box\.feature_extractor\.fc(6)\.(weight)$",
     "p:feature_extractor/fc{0}/{w01}:dense_chw"),
    (r"^roi_heads\.box\.feature_extractor\.fc([67])\.(weight|bias)$",
     "p:feature_extractor/fc{0}/{w01}:{dw01}"),
    (r"^roi_heads\.box\.predictor\.cls_score\.(weight|bias)$",
     "p:predictor/cls_score/{w01}:{dw01}"),
    (r"^roi_heads\.box\.predictor\.bbox_pred\.(weight|bias)$",
     "p:predictor/bbox_pred/{w01}:{dw01}"),
    # both the 2-domain module ("da_heads.") and the triplet module
    # ("da_heads_triplet.") land on our single DA module's tree; a triplet
    # reference checkpoint contains BOTH (generalized_rcnn.py:53-57 there)
    # and the triplet one is the one its forward uses — it also sorts after
    # "da_heads." in the state dict, so last-write-wins resolves correctly
    (r"^da_heads(?:_triplet)?\.imghead\.conv(\d)_da\.(weight|bias)$",
     "p:da_heads/imghead/conv{0}_da/{w01}:{cw01}"),
    (r"^da_heads(?:_triplet)?\.inshead\.fc(\d)_da\.(weight|bias)$",
     "p:da_heads/inshead/fc{0}_da/{w01}:{dw01}"),
]


def infer_pool_resolution(state: dict):
    """Derive the box pooler resolution R from a torch checkpoint itself:
    fc6's input dim is C*R*R where C is the channel count of the conv
    feeding the pooler (the FPN output convs for FPN2MLP heads). Returns
    None when the checkpoint has no fc6 (C4 head — R is irrelevant) or the
    shapes don't pin a unique R (caller falls back to its configured value).
    """
    state = _strip_prefix(state)
    fc6 = state.get("roi_heads.box.feature_extractor.fc6.weight")
    if fc6 is None:
        return None
    in_f = int(np.asarray(fc6).shape[1])
    chans = None
    for k in ("backbone.fpn.fpn_layer1.weight",
              "backbone.fpn.fpn_layer2.weight"):
        if k in state:
            chans = int(np.asarray(state[k]).shape[0])
            break
    if not chans or in_f % chans:
        return None
    r = math.isqrt(in_f // chans)
    return r if r * r * chans == in_f else None


def torch_to_flax(state: dict, *, pool_resolution: int = 7):
    """maskrcnn-benchmark state_dict -> (params, frozen) trees.

    Handles convs/linears via the rename table and FrozenBN via stat
    folding. Unmatched keys are returned for the caller to log (mirrors
    align_and_update_state_dicts' reporting). ``pool_resolution`` is the
    box pooler output size (MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION) — needed
    to un-flatten fc6's input dim for the NCHW->NHWC permutation.
    """
    state = _strip_prefix(state)
    params: dict = {}
    frozen: dict = {}
    used = set()

    # frozen BN folding: find *.running_var keys
    bn_re_map = [
        (r"^backbone\.body\.stem\.bn1$", "backbone/body/stem/bn1"),
        (r"^backbone\.body\.layer(\d)\.(\d+)\.bn(\d)$",
         "backbone/body/layer{0}/block{1}/bn{2}"),
        (r"^backbone\.body\.layer(\d)\.(\d+)\.downsample\.1$",
         "backbone/body/layer{0}/block{1}/downsample_bn"),
        (r"^roi_heads\.box\.feature_extractor\.head\.layer4\.(\d+)\.bn(\d)$",
         "feature_extractor/head/layer4/block{0}/bn{1}"),
        (r"^roi_heads\.box\.feature_extractor\.head\.layer4\.(\d+)\.downsample\.1$",
         "feature_extractor/head/layer4/block{0}/downsample_bn"),
    ]
    prefixes = {k.rsplit(".", 1)[0] for k in state if k.endswith(".running_var")}
    for prefix in sorted(prefixes):
        for pat, tmpl in bn_re_map:
            m = re.match(pat, prefix)
            if m:
                scale, bias = _fold_frozen_bn(state, prefix)
                # block index: torch layers are 0-based like ours
                path = tmpl.format(*m.groups()).split("/")
                _set(frozen, path + ["scale"], scale)
                _set(frozen, path + ["bias"], bias)
                for suf in (".weight", ".bias", ".running_mean", ".running_var"):
                    used.add(prefix + suf)
                break

    for key, val in state.items():
        if key in used:
            continue
        for pat, tmpl in _TORCH_RENAMES:
            m = re.match(pat, key)
            if not m:
                continue
            groups = m.groups()
            is_weight = groups and groups[-1] == "weight"
            spec = tmpl.format(*groups,
                               w01="kernel" if is_weight or key.endswith("weight") else "bias",
                               cw01="conv" if key.endswith("weight") else "raw",
                               dw01="dense" if key.endswith("weight") else "raw")
            _, path_s, kind = spec.split(":")
            v = np.asarray(val)
            if kind == "conv":
                v = _conv(v)
            elif kind == "dense":
                v = np.ascontiguousarray(v.T)
            elif kind == "dense_chw":
                out_f, in_f = v.shape
                rr = pool_resolution * pool_resolution
                assert in_f % rr == 0, (key, v.shape, pool_resolution)
                c = in_f // rr
                v = v.reshape(out_f, c, pool_resolution, pool_resolution)
                v = v.transpose(0, 2, 3, 1).reshape(out_f, in_f)
                v = np.ascontiguousarray(v.T)
            _set(params, path_s.split("/"), v)
            used.add(key)
            break

    unmatched = [k for k in state if k not in used]
    return params, frozen, unmatched


def merge_into(target: dict, src: dict, path=()):
    """Recursively copy matching leaves of ``src`` into dict-tree ``target``
    (suffix-free exact-path merge; shape-checked). Returns list of applied
    paths."""
    applied = []
    for k, v in src.items():
        if k not in target:
            continue
        if isinstance(v, dict) and isinstance(target[k], dict):
            applied += merge_into(target[k], v, path + (k,))
        elif not isinstance(v, dict):
            tgt = target[k]
            if tuple(np.shape(tgt)) != tuple(np.shape(v)):
                raise ValueError(
                    f"shape mismatch at {'/'.join(path + (k,))}: "
                    f"{np.shape(tgt)} vs {np.shape(v)}")
            target[k] = np.asarray(v).astype(np.asarray(tgt).dtype)
            applied.append("/".join(path + (k,)))
    return applied
