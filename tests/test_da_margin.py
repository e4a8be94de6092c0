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
