"""Adaptive triplet-margin dynamics (reference da_heads/loss.py:180-228):
the image margin grows by ``lr`` exactly when the PREVIOUS step's triplet
loss hit 0.0 and int(margin) != int(max_margin) — threaded through the real
DA module as explicit DAState (the reference keeps it in python lists on the
module, invisible to checkpoints)."""

import jax
import jax.numpy as jnp
import numpy as np

from da_detect_tpu.models.da import (DAState, DomainAdaptationModule,
                                     _updated_margin)


def test_updated_margin_unit():
    lr = 0.001
    # grows on zero loss with headroom
    m = _updated_margin(jnp.float32(1.0), jnp.float32(0.0), lr, 3.0)
    np.testing.assert_allclose(float(m), 1.001)
    # no growth on nonzero loss
    m = _updated_margin(jnp.float32(1.0), jnp.float32(0.25), lr, 3.0)
    np.testing.assert_allclose(float(m), 1.0)
    # the shipped default max==initial disables growth (int(1) == int(1))
    m = _updated_margin(jnp.float32(1.0), jnp.float32(0.0), lr, 1.0)
    np.testing.assert_allclose(float(m), 1.0)
    # stops once int(margin) reaches int(max_margin)
    m = _updated_margin(jnp.float32(3.0), jnp.float32(0.0), lr, 3.0)
    np.testing.assert_allclose(float(m), 3.0)


def _run_module(state, img_set, max_margin=3.0):
    mod = DomainAdaptationModule(img_weight=0.0, ins_weight=0.0,
                                 cst_weight=0.0, triplet_img_weight=1.0,
                                 triplet_ins_weight=0.0,
                                 triplet_max_margin=max_margin)
    variables = mod.init(jax.random.PRNGKey(0), [], None, None, None, None,
                         img_set, None, state, deterministic=True)
    return mod.apply(variables, [], None, None, None, None, img_set, None,
                     state, deterministic=True)


def test_margin_grows_through_module_on_zero_loss():
    """fs == fp and fn far away -> hinge exactly 0; with the previous loss
    recorded as 0 the margin must step by lr, and the new loss (0) must be
    recorded for the next step."""
    fs = jnp.ones((2, 4, 6, 8))
    fp = jnp.ones((2, 4, 6, 8))
    fn = jnp.full((2, 4, 6, 8), 50.0)
    state = DAState.create(margin_img=1.0)
    state = state.replace(last_triplet_img=jnp.float32(0.0))

    losses, new_state = _run_module(state, (fs, fp, fn))
    np.testing.assert_allclose(float(losses["triplet_loss_image"]), 0.0,
                               atol=1e-6)
    np.testing.assert_allclose(float(new_state.margin_img), 1.001)
    np.testing.assert_allclose(float(new_state.last_triplet_img), 0.0,
                               atol=1e-6)

    # iterate: growth accumulates step over step while losses stay 0
    _, s2 = _run_module(new_state, (fs, fp, fn))
    np.testing.assert_allclose(float(s2.margin_img), 1.002)


def test_margin_static_with_default_max():
    fs = jnp.ones((2, 4, 6, 8))
    fn = jnp.full((2, 4, 6, 8), 50.0)
    state = DAState.create(margin_img=1.0)
    state = state.replace(last_triplet_img=jnp.float32(0.0))
    _, new_state = _run_module(state, (fs, fs, fn), max_margin=1.0)
    np.testing.assert_allclose(float(new_state.margin_img), 1.0)


def test_margin_frozen_on_nonzero_loss():
    fs = jnp.ones((2, 4, 6, 8))
    fp = jnp.full((2, 4, 6, 8), 30.0)   # far positive -> big hinge loss
    fn = jnp.ones((2, 4, 6, 8))
    state = DAState.create(margin_img=1.0)
    state = state.replace(last_triplet_img=jnp.float32(0.7))
    losses, new_state = _run_module(state, (fs, fp, fn))
    assert float(losses["triplet_loss_image"]) > 0
    np.testing.assert_allclose(float(new_state.margin_img), 1.0)
    # the nonzero current loss is recorded as the next step's trigger input
    np.testing.assert_allclose(float(new_state.last_triplet_img),
                               float(losses["triplet_loss_image"]), rtol=1e-6)


# ---------------------------------------------------------------------------
# Composed-over-time anchor against the reference's OWN module
# ---------------------------------------------------------------------------
# The unit pins above re-derive the growth rule; these tests run the
# reference's DALossComputation_Component.triplet_img_loss for several
# consecutive steps with its own prev-loss threading
# (da_heads.py:112-113,241,325 there: self.triplet_img[-1] in,
# unweighted loss appended out) next to our DAState composition, and
# assert the margin trajectories AND the losses computed *with* the grown
# margins match step for step.

import os as _os

import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/maskrcnn_benchmark"


@pytest.fixture(scope="module")
def ref_loss_component():
    """Load the reference's da_heads/loss.py into a stub package (its
    siblings import the absent ``_C`` extension; same technique as
    tests/test_da_reference_parity.py)."""
    if not _os.path.isdir(REF):
        pytest.skip("reference tree not available")
    import importlib.util
    import sys
    import types

    saved = {k: v for k, v in sys.modules.items()
             if k.startswith("maskrcnn_benchmark")}
    for k in list(saved):
        del sys.modules[k]

    def _load(name, relpath):
        spec = importlib.util.spec_from_file_location(
            name, _os.path.join(REF, relpath))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

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
        modeling.__path__ = [_os.path.join(REF, "modeling")]
        sys.modules["maskrcnn_benchmark.modeling"] = modeling
        da_pkg = types.ModuleType("maskrcnn_benchmark.modeling.da_heads")
        da_pkg.__path__ = [_os.path.join(REF, "modeling", "da_heads")]
        sys.modules["maskrcnn_benchmark.modeling.da_heads"] = da_pkg
        structures = types.ModuleType("maskrcnn_benchmark.structures")
        blo = types.ModuleType("maskrcnn_benchmark.structures.boxlist_ops")
        blo.cat_boxlist = None
        sys.modules["maskrcnn_benchmark.structures"] = structures
        sys.modules["maskrcnn_benchmark.structures.boxlist_ops"] = blo
        poolers = types.ModuleType("maskrcnn_benchmark.modeling.poolers")

        class _Pooler:  # constructed in the evaluator __init__, never called
            def __init__(self, **kw):
                pass

        poolers.Pooler = _Pooler
        sys.modules["maskrcnn_benchmark.modeling.poolers"] = poolers
        _load("maskrcnn_benchmark.modeling.utils", "modeling/utils.py")
        _load("maskrcnn_benchmark.modeling.matcher", "modeling/matcher.py")
        loss_mod = _load("maskrcnn_benchmark.modeling.da_heads.loss",
                         "modeling/da_heads/loss.py")
        from da_detect_tpu.config import get_cfg
        yield loss_mod.DALossComputation_Component(get_cfg())
    finally:
        for k in [k for k in sys.modules
                  if k.startswith("maskrcnn_benchmark")]:
            del sys.modules[k]
        sys.modules.update(saved)


def _crafted_triplet(separation: float, n=1, c=2, h=2, w=4):
    """anchor == positive (d_ap ~ eps), negative at exact p=2 distance
    ``separation`` along the reduced axis. Returns (torch NCHW triple,
    jax NHWC triple): torch reduces the last dim (W); our image path
    reduces axis=2 (W of NHWC)."""
    a_t = torch.zeros(n, c, h, w)
    p_t = torch.zeros(n, c, h, w)
    g_t = torch.full((n, c, h, w), separation / w ** 0.5)
    to_j = lambda t: jnp.asarray(t.numpy().transpose(0, 2, 3, 1))
    return (a_t, p_t, g_t), (to_j(a_t), to_j(p_t), to_j(g_t))


def _compose_reference(comp, triple, steps, margin=1.0, max_margin=3.0):
    """The reference module's own loop (da_heads.py:241,325): prev loss
    list threaded in, unweighted loss appended out."""
    comp.margin_img = 0.0  # fresh module state (loss.py:128)
    prev = [torch.tensor(1.0)]  # self.triplet_img = [1] (da_heads.py:113)
    margins, losses = [], []
    for _ in range(steps):
        with torch.no_grad():
            l = comp.triplet_img_loss(*triple, prev[-1], adaptive=True,
                                      lr=0.001, max_margin=max_margin,
                                      margin=margin)
        prev.append(l.detach())
        margins.append(float(comp.margin_img))
        losses.append(float(l))
    return margins, losses


def _compose_ours(triple, steps, margin=1.0, max_margin=3.0):
    state = DAState.create(margin_img=margin)
    margins, losses = [], []
    for _ in range(steps):
        out, state = _run_module(state, triple, max_margin=max_margin)
        margins.append(float(state.margin_img))
        losses.append(float(out["triplet_loss_image"]))
    return margins, losses


def test_margin_growth_composes_like_reference(ref_loss_component):
    """Six steps with separation 1.0025: the margin must grow 1.0 ->
    1.001 -> 1.002 -> 1.003 (zero losses), then the GROWN margin makes
    step 4's loss positive (~5e-4 — proof the next step consumes it),
    freezing growth for steps 5-6. Both sides, step for step."""
    t_triple, j_triple = _crafted_triplet(1.0025)
    r_m, r_l = _compose_reference(ref_loss_component, t_triple, 6)
    o_m, o_l = _compose_ours(j_triple, 6)
    np.testing.assert_allclose(o_m, r_m, rtol=0, atol=1e-6)
    np.testing.assert_allclose(o_l, r_l, rtol=1e-4, atol=1e-7)
    # the scenario really exercised every regime:
    assert r_l[2] == 0.0 and r_l[3] > 0.0          # growth then trip
    assert r_m[0] == 1.0                            # step 1: prev=1 (init)
    np.testing.assert_allclose(r_m[3], 1.003, atol=1e-6)
    assert r_m[5] == r_m[3]                         # frozen after trip


def test_margin_cap_composes_like_reference(ref_loss_component):
    """Start at 2.9995 under max 3.0 with an always-zero loss: one growth
    step crosses into int(margin)==int(max) (-> 3.0005) and the
    int-compare cap freezes it there — both sides."""
    t_triple, j_triple = _crafted_triplet(5.0)  # huge separation: loss 0
    r_m, r_l = _compose_reference(ref_loss_component, t_triple, 4,
                                  margin=2.9995)
    # reference step 1 consumes prev=1 (no growth); steps 2+ consume 0.0
    o_m, o_l = _compose_ours(j_triple, 4, margin=2.9995)
    np.testing.assert_allclose(o_m, r_m, rtol=0, atol=1e-6)
    np.testing.assert_allclose(o_l, r_l, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(r_m, [2.9995, 3.0005, 3.0005, 3.0005],
                               atol=1e-6)
