"""DA research-core parity against the reference's OWN DA module.

The deepest numerics anchor available: the reference's
``DomainAdaptationModule_triplet`` (modeling/da_heads/da_heads.py:72-349) and
its split loss evaluator (da_heads/loss.py:108-228) are loaded into a stub
package (their ``_C``-importing siblings are never touched), our
``DomainAdaptationModule`` gets the torch module's exact weights, and both
run the same inputs through the full DA forward: every loss component must
match, and so must the gradients w.r.t. every input feature and every head
weight — which pins the GRL signs, the AdvGRL data-dependent scale, and the
detach/probe topology, not just the loss formulas.

Two full-forward scenarios:
* plain-GRL branch (random tiny-init heads -> probe loss ~0.693 > 0.6288)
* AdvGRL-active branch (crafted domain-separable features + identity-ish
  head -> probe loss ~0.35, boosted weight -w_adv * min(thr, 1/loss))

plus direct Adv_GRL / Adv_GRL_Optimized gradient-scale sweeps and the BCE
band constants (the reference's inline comments mislabel them; the tensor
expressions are the ground truth).

The only reference line changed for CPU execution is noted at the
monkeypatch below (a ``.type(torch.cuda.FloatTensor)`` label cast).
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF = "/root/reference/maskrcnn_benchmark"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not available")


def _load(name, relpath):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_da():
    """Load reference da_heads + loss into a stub maskrcnn_benchmark package
    (the real package __init__ chain pulls the absent ``_C`` extension)."""
    saved = {k: v for k, v in sys.modules.items()
             if k.startswith("maskrcnn_benchmark")}
    for k in list(saved):
        del sys.modules[k]
    try:
        root = types.ModuleType("maskrcnn_benchmark")
        root.__path__ = [REF]
        sys.modules["maskrcnn_benchmark"] = root

        grl = _load("maskrcnn_benchmark.layers.gradient_scalar_layer",
                    "layers/gradient_scalar_layer.py")
        consist = _load("maskrcnn_benchmark.layers.consistency_loss",
                        "layers/consistency_loss.py")
        layers = types.ModuleType("maskrcnn_benchmark.layers")
        layers.GradientScalarLayer = grl.GradientScalarLayer
        layers.consistency_loss = consist.consistency_loss
        sys.modules["maskrcnn_benchmark.layers"] = layers

        modeling = types.ModuleType("maskrcnn_benchmark.modeling")
        modeling.__path__ = [os.path.join(REF, "modeling")]
        sys.modules["maskrcnn_benchmark.modeling"] = modeling
        da_pkg = types.ModuleType("maskrcnn_benchmark.modeling.da_heads")
        da_pkg.__path__ = [os.path.join(REF, "modeling", "da_heads")]
        sys.modules["maskrcnn_benchmark.modeling.da_heads"] = da_pkg

        structures = types.ModuleType("maskrcnn_benchmark.structures")
        blo = types.ModuleType("maskrcnn_benchmark.structures.boxlist_ops")
        blo.cat_boxlist = None  # imported by loss.py, unused by these paths
        sys.modules["maskrcnn_benchmark.structures"] = structures
        sys.modules["maskrcnn_benchmark.structures.boxlist_ops"] = blo

        poolers = types.ModuleType("maskrcnn_benchmark.modeling.poolers")

        class _Pooler:  # constructed in loss evaluator __init__, never called
            def __init__(self, **kw):
                pass

        poolers.Pooler = _Pooler
        sys.modules["maskrcnn_benchmark.modeling.poolers"] = poolers

        _load("maskrcnn_benchmark.modeling.utils", "modeling/utils.py")
        _load("maskrcnn_benchmark.modeling.matcher", "modeling/matcher.py")
        loss_mod = _load("maskrcnn_benchmark.modeling.da_heads.loss",
                         "modeling/da_heads/loss.py")

        # CPU fix: the reference casts labels with .type(torch.cuda.FloatTensor)
        # (da_heads/loss.py:172-174) which requires a CUDA build; same math.
        def _da_ins_loss_cpu(self, da_ins, da_ins_labels):
            return torch.nn.functional.binary_cross_entropy_with_logits(
                torch.squeeze(da_ins), da_ins_labels.float())

        loss_mod.DALossComputation_Component.da_ins_loss = _da_ins_loss_cpu
        da_mod = _load("maskrcnn_benchmark.modeling.da_heads.da_heads",
                       "modeling/da_heads/da_heads.py")
        yield da_mod
    finally:
        for k in [k for k in sys.modules if k.startswith("maskrcnn_benchmark")]:
            del sys.modules[k]
        sys.modules.update(saved)


class _FakeTarget:
    def __init__(self, is_source: bool, n: int = 3):
        self._t = (torch.ones if is_source else torch.zeros)(n).bool()

    def get_field(self, name):
        assert name == "is_source"
        return self._t


def _cfg():
    from da_detect_tpu.config import get_cfg
    cfg = get_cfg()  # the same key schema the reference cfg exposes
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-C4"
    cfg.MODEL.BACKBONE.OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 32   # ins feature dim 32*8 = 256
    cfg.MODEL.DA_HEADS.DA_ADV_GRL = True
    return cfg


def _torch_module(ref_da, cfg):
    torch.manual_seed(0)
    m = ref_da.DomainAdaptationModule_triplet(cfg)
    m.train()
    m.inshead.eval()  # dropout off for determinism (our deterministic=True)
    return m


def _jax_module_and_params(cfg, tm):
    from da_detect_tpu.models.da import make_da_heads

    module = make_da_heads(cfg, jnp.float32)

    def t2j(t):
        return jnp.asarray(t.detach().numpy())

    params = {"imghead": {}, "inshead": {}}
    for name in ("conv1_da", "conv2_da"):
        conv = getattr(tm.imghead, name)
        params["imghead"][name] = {
            "kernel": t2j(conv.weight.permute(2, 3, 1, 0)),  # OIHW -> HWIO
            "bias": t2j(conv.bias)}
    for name in ("fc1_da", "fc2_da", "fc3_da"):
        fc = getattr(tm.inshead, name)
        params["inshead"][name] = {"kernel": t2j(fc.weight.T),
                                   "bias": t2j(fc.bias)}
    return module, {"params": params}


def _run_both(ref_da, craft_advgrl: bool):
    """Run the reference and JAX DA modules on identical inputs; return
    (torch losses, jax losses, torch grads, jax grads) keyed alike."""
    from da_detect_tpu.models.da import DAState

    cfg = _cfg()
    tm = _torch_module(ref_da, cfg)
    if craft_advgrl:
        # identity-ish image head: logit = mean over the first 64 relu'd
        # channels -> strongly domain-separable features push the probe BCE
        # to ~0.35 < 0.6288, activating the AdvGRL boosted weight
        with torch.no_grad():
            tm.imghead.conv1_da.weight.zero_()
            for c in range(64):
                tm.imghead.conv1_da.weight[c, c, 0, 0] = 1.0
            tm.imghead.conv1_da.bias.zero_()
            tm.imghead.conv2_da.weight.zero_()
            tm.imghead.conv2_da.weight[0, :64, 0, 0] = 1.0 / 64
            tm.imghead.conv2_da.bias.zero_()
    jm, variables = _jax_module_and_params(cfg, tm)

    rng = np.random.RandomState(7)
    s = 5  # instances per image
    shift = 5.0 if craft_advgrl else 0.0
    # equal H*W per level: the reference's da_img_loss torch.cat(dim=0)
    # requires it (loss.py:162 crashes otherwise — its DA configs are
    # single-level C4); ours handles unequal levels, tested elsewhere
    lvls = [(8, 12), (12, 8)]
    feats = [rng.randn(2, h, w, 64).astype(np.float32)
             + np.array([shift, -shift], np.float32).reshape(2, 1, 1, 1)
             for (h, w) in lvls]
    ins = rng.randn(2, s, 7, 7, 256).astype(np.float32)
    trip_img = [rng.randn(1, 8, 12, 64).astype(np.float32) for _ in range(3)]
    trip_ins = [rng.randn(1, s, 7, 7, 256).astype(np.float32)
                for _ in range(3)]

    # ---- torch side (NCHW; instance rows source-first) ----
    t_feats = [torch.tensor(f.transpose(0, 3, 1, 2), requires_grad=True)
               for f in feats]
    t_ins = torch.tensor(
        ins.reshape(2 * s, 7, 7, 256).transpose(0, 3, 1, 2).copy(),
        requires_grad=True)
    t_trip_img = [torch.tensor(f.transpose(0, 3, 1, 2), requires_grad=True)
                  for f in trip_img]
    t_trip_ins = [torch.tensor(
        f.reshape(s, 7, 7, 256).transpose(0, 3, 1, 2).copy(),
        requires_grad=True) for f in trip_ins]
    labels = torch.cat([torch.ones(s), torch.zeros(s)])
    targets = [_FakeTarget(True), _FakeTarget(False)]
    t_losses = tm(t_feats, t_ins, labels,
                  tuple(t_trip_ins), tuple([f] for f in t_trip_img), targets)
    sum(t_losses.values()).backward()
    t_grads = {
        "feat0": t_feats[0].grad.numpy().transpose(0, 2, 3, 1),
        "ins": t_ins.grad.numpy().transpose(0, 2, 3, 1).reshape(2, s, 7, 7, 256),
        "trip_img0": t_trip_img[0].grad.numpy().transpose(0, 2, 3, 1),
        "trip_ins0": t_trip_ins[0].grad.numpy().transpose(0, 2, 3, 1).reshape(
            1, s, 7, 7, 256),
        "conv1_w": tm.imghead.conv1_da.weight.grad.numpy().transpose(2, 3, 1, 0),
        "fc1_w": tm.inshead.fc1_da.weight.grad.numpy().T,
    }

    # ---- jax side ----
    dom_mask = jnp.array([[1.0] * s, [0.0] * s])
    valid = jnp.ones((2, s), bool)
    is_source = jnp.array([True, False])

    def total(variables, feats, ins, trip_ins, trip_img):
        losses, _ = jm.apply(
            variables, [jnp.asarray(f) for f in feats], jnp.asarray(ins),
            dom_mask, valid, tuple(jnp.asarray(f) for f in trip_ins),
            tuple(jnp.asarray(f) for f in trip_img), is_source,
            DAState.create(margin_img=cfg.MODEL.DA_HEADS.TRIPLET_MARGIN_IMG),
            deterministic=True)
        return sum(jax.tree_util.tree_leaves(losses)), losses

    (_, j_losses), grads = jax.value_and_grad(
        total, argnums=(0, 1, 2, 3, 4), has_aux=True)(
        variables, feats, ins, trip_ins, trip_img)
    gv, gfeat, gins, gtins, gtimg = grads
    j_grads = {
        "feat0": np.asarray(gfeat[0]),
        "ins": np.asarray(gins),
        "trip_img0": np.asarray(gtimg[0]),
        "trip_ins0": np.asarray(gtins[0]),
        "conv1_w": np.asarray(gv["params"]["imghead"]["conv1_da"]["kernel"]),
        "fc1_w": np.asarray(gv["params"]["inshead"]["fc1_da"]["kernel"]),
    }
    t_losses = {k: float(v.detach()) for k, v in t_losses.items()}
    j_losses = {k: float(v) for k, v in j_losses.items()}
    return t_losses, j_losses, t_grads, j_grads


@pytest.mark.parametrize("craft_advgrl", [False, True],
                         ids=["plain_grl", "advgrl_active"])
def test_full_da_forward_and_grads_match_reference(ref_da, craft_advgrl):
    t_losses, j_losses, t_grads, j_grads = _run_both(ref_da, craft_advgrl)
    assert set(t_losses) == set(j_losses) == {
        "loss_da_image", "loss_da_instance", "loss_da_consistency",
        "triplet_loss_image", "triplet_loss_instance"}
    for k in t_losses:
        np.testing.assert_allclose(j_losses[k], t_losses[k], rtol=2e-5,
                                   atol=1e-6, err_msg=f"loss {k}")
    for k in t_grads:
        np.testing.assert_allclose(
            j_grads[k], t_grads[k], rtol=2e-4, atol=1e-6,
            err_msg=f"grad {k} (GRL/AdvGRL topology diverges)")


@pytest.mark.parametrize("probe_loss", [0.2, 0.01, 0.65, 0.6288])
def test_adv_grl_gradient_scale(ref_da, probe_loss):
    """The Adv_GRL gradient scale: -w_adv*min(threshold, 1/loss) when the
    probe loss <= BCE([0.7,0.3],[1,0]) ~ 0.62879, else plain -w.

    When 1/loss exceeds the threshold the reference CRASHES (min() returns
    the python int threshold and da_heads.py:183 calls .numpy() on it) — a
    latent reference bug; we pin our clamped value and the crash."""
    from da_detect_tpu.models.da import adv_grl_weight

    cfg = _cfg()
    tm = _torch_module(ref_da, cfg)
    thr = float(cfg.MODEL.DA_HEADS.DA_ADV_GRL_THRESHOLD)
    ours = float(adv_grl_weight(
        jnp.float32(probe_loss), cfg.MODEL.DA_HEADS.DA_IMG_GRL_WEIGHT,
        cfg.MODEL.DA_HEADS.DA_IMG_advGRL_WEIGHT, thr))
    feat = torch.randn(1, 4, 3, 3, requires_grad=True)
    if 1.0 / probe_loss > thr:
        with pytest.raises(AttributeError):
            tm.Adv_GRL(torch.tensor(probe_loss), [feat])
        np.testing.assert_allclose(
            ours, -cfg.MODEL.DA_HEADS.DA_IMG_advGRL_WEIGHT * thr, rtol=1e-6)
        return
    out = tm.Adv_GRL(torch.tensor(probe_loss), [feat])[0]
    out.sum().backward()
    ref_w = float(feat.grad.reshape(-1)[0])
    np.testing.assert_allclose(ours, ref_w, rtol=1e-5)


@pytest.mark.parametrize("probe_loss", [0.2, 0.69, 0.8])
def test_adv_grl_optimized_gradient_scale(ref_da, probe_loss):
    """Banded Adv_GRL_Optimized variant (boost / plain / damp)."""
    from da_detect_tpu.models.da import adv_grl_weight_optimized

    cfg = _cfg()
    tm = _torch_module(ref_da, cfg)
    feat = torch.randn(1, 4, 3, 3, requires_grad=True)
    out = tm.Adv_GRL_Optimized(torch.tensor(probe_loss), [feat])[0]
    out.sum().backward()
    ref_w = float(feat.grad.reshape(-1)[0])
    ours = float(adv_grl_weight_optimized(
        jnp.float32(probe_loss), cfg.MODEL.DA_HEADS.DA_IMG_GRL_WEIGHT,
        cfg.MODEL.DA_HEADS.DA_IMG_advGRL_WEIGHT,
        float(cfg.MODEL.DA_HEADS.DA_ADV_GRL_THRESHOLD)))
    np.testing.assert_allclose(ours, ref_w, rtol=1e-5)


def test_advgrl_band_constants_match_torch():
    """Our hard-coded BCE thresholds equal the reference's torch expressions
    (da_heads.py:175,199-200 — whose inline comments mislabel the values)."""
    from da_detect_tpu.models.da import (ADVGRL_BCE_MAX, ADVGRL_BCE_MIN,
                                         ADVGRL_BCE_THRESHOLD)

    F = torch.nn.functional
    pairs = [(ADVGRL_BCE_THRESHOLD, [[0.7, 0.3]]),
             (ADVGRL_BCE_MIN, [[0.6, 0.4]]),
             (ADVGRL_BCE_MAX, [[0.55, 0.45]])]
    for ours, logits in pairs:
        ref = float(F.binary_cross_entropy_with_logits(
            torch.tensor(logits), torch.tensor([[1.0, 0.0]])))
        np.testing.assert_allclose(ours, ref, rtol=1e-6)
