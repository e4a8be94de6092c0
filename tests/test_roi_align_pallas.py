"""Pallas ROIAlign kernel vs the einsum formulation (interpreter mode on CPU;
compiled on TPU in production). The einsum path is itself validated against
the reference CPU oracle in test_roi_align.py / test_native.py, so agreement
here chains to reference numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from da_detect_tpu.ops import roi_align as ra
from da_detect_tpu.ops import roi_align_pallas as rap


@pytest.fixture(autouse=True)
def _interpret():
    rap.INTERPRET = True
    yield
    rap.INTERPRET = False


def _random_case(seed, b=2, r=11, h=10, w=16, c=128):
    rng = np.random.RandomState(seed)
    feats = rng.randn(b, h, w, c).astype(np.float32)
    x1 = rng.uniform(0, w * 16 - 24, (b, r))
    y1 = rng.uniform(0, h * 16 - 24, (b, r))
    rois = np.stack([x1, y1, x1 + rng.uniform(4, 80, (b, r)),
                     y1 + rng.uniform(4, 80, (b, r))], -1).astype(np.float32)
    return jnp.asarray(feats), jnp.asarray(rois)


@pytest.mark.parametrize("p,sampling_ratio", [(7, 2), (14, 0)])
def test_pallas_forward_matches_einsum(p, sampling_ratio):
    feats, rois = _random_case(0)
    kw = dict(spatial_scale=1.0 / 16, output_size=p,
              sampling_ratio=sampling_ratio, max_samples=4)
    want = jax.vmap(lambda f, r: ra.roi_align_image(f, r, **kw))(feats, rois)
    got = rap.roi_align_pallas(feats, rois, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pallas_forward_roi_padding():
    # R not a multiple of the kernel's ROI block
    feats, rois = _random_case(1, r=13)
    kw = dict(spatial_scale=1.0 / 16, output_size=7, sampling_ratio=0)
    want = jax.vmap(lambda f, r: ra.roi_align_image(f, r, **kw))(feats, rois)
    got = rap.roi_align_pallas(feats, rois, **kw)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pallas_backward_matches_einsum():
    feats, rois = _random_case(2, b=1, r=8, h=6, w=8, c=128)
    kw = dict(spatial_scale=1.0 / 16, output_size=7, sampling_ratio=0)

    def loss_pallas(f):
        out = rap.roi_align_pallas(f, rois, **kw)
        return jnp.sum(out * out)

    def loss_einsum(f):
        out = jax.vmap(lambda fi, ri: ra.roi_align_image(fi, ri, **kw))(f, rois)
        return jnp.sum(out * out)

    g_pallas = jax.grad(loss_pallas)(feats)
    g_einsum = jax.grad(loss_einsum)(feats)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_einsum),
                               rtol=1e-4, atol=1e-4)


def test_dispatcher_prefers_pallas_when_fits():
    feats, rois = _random_case(3)
    kw = dict(spatial_scale=1.0 / 16, output_size=7, sampling_ratio=0)
    via_dispatch = ra.roi_align(feats, rois, use_pallas=True, **kw)
    direct = rap.roi_align_pallas(feats, rois, **kw)
    np.testing.assert_allclose(np.asarray(via_dispatch), np.asarray(direct),
                               rtol=1e-6, atol=1e-6)
    # non-128 channel count must fall back to the einsum path, not crash
    feats_odd = feats[..., :100]
    out = ra.roi_align(feats_odd, rois, use_pallas=True, **kw)
    want = jax.vmap(lambda f, r: ra.roi_align_image(f, r, **kw))(feats_odd, rois)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
