"""Numeric tests for the tap-scanned DeformConv2d lowering.

The oracle is a deliberately naive per-tap bilinear sampler (the direct
transcription of the reference CUDA deformable_im2col semantics,
/root/reference/maskrcnn_benchmark/csrc/cuda/deform_conv_kernel_cuda.cu):
sample each kernel tap at base+offset with bilinear interpolation, zero
outside the map, multiply by the DCNv2 modulation mask, contract with the
kernel. The production path restructures this into a scanned
gather-and-accumulate; these tests pin that the restructure is exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from da_detect_tpu.layers.deform_conv import DeformConv2d


def _naive_oracle(x, off, mask, kernel, strides, dilation, dg):
    """x [b,h,w,c] f32; off [b,oh,ow,dg,nk,2] (dy,dx); mask [b,oh,ow,dg,nk]
    or None; kernel [k,k,c,f] (fg=1 only). Plain numpy, O(everything)."""
    b, h, w, c = x.shape
    k = kernel.shape[0]
    nk = k * k
    pad = dilation * (k - 1) // 2
    oh, ow = off.shape[1], off.shape[2]
    f = kernel.shape[-1]
    cg = c // dg
    out = np.zeros((b, oh, ow, f), np.float64)
    for bi in range(b):
        for oy in range(oh):
            for ox in range(ow):
                for ki in range(k):
                    for kj in range(k):
                        t = ki * k + kj
                        for g in range(dg):
                            dy, dx = off[bi, oy, ox, g, t]
                            sy = oy * strides - pad + ki * dilation + dy
                            sx = ox * strides - pad + kj * dilation + dx
                            y0, x0 = int(np.floor(sy)), int(np.floor(sx))
                            ly, lx = sy - y0, sx - x0
                            val = np.zeros(cg, np.float64)
                            for (yy, xx, wt) in ((y0, x0, (1 - ly) * (1 - lx)),
                                                 (y0, x0 + 1, (1 - ly) * lx),
                                                 (y0 + 1, x0, ly * (1 - lx)),
                                                 (y0 + 1, x0 + 1, ly * lx)):
                                if 0 <= yy < h and 0 <= xx < w:
                                    val += wt * x[bi, yy, xx,
                                                  g * cg:(g + 1) * cg]
                            if mask is not None:
                                val *= mask[bi, oy, ox, g, t]
                            out[bi, oy, ox] += val @ kernel[
                                ki, kj, g * cg:(g + 1) * cg]
    return out


def _random_offset_params(params, key, scale=2.5, modulated=False):
    """Replace the zero-init offset predictor with random weights so the
    sampling grid is genuinely deformed."""
    p = jax.tree_util.tree_map(lambda a: a, params)
    conv = p["params"]["conv_offset"]
    k1, k2 = jax.random.split(key)
    conv["kernel"] = scale * jax.random.normal(k1, conv["kernel"].shape)
    conv["bias"] = scale * 0.3 * jax.random.normal(k2, conv["bias"].shape)
    return p


@pytest.mark.parametrize("modulated", [False, True])
@pytest.mark.parametrize("strides,dilation,dg", [(1, 1, 1), (2, 2, 2)])
def test_matches_naive_oracle(modulated, strides, dilation, dg):
    key = jax.random.PRNGKey(0)
    b, h, w, c, f = 2, 7, 6, 4, 5
    x = jax.random.normal(key, (b, h, w, c))
    m = DeformConv2d(features=f, kernel_size=3, strides=strides,
                     dilation=dilation, deformable_groups=dg,
                     modulated=modulated)
    params = m.init(jax.random.PRNGKey(1), x)
    params = _random_offset_params(params, jax.random.PRNGKey(2),
                                   modulated=modulated)
    out = np.asarray(m.apply(params, x))

    # recompute the offsets/mask the module derived, feed the oracle
    k = 3
    nk = k * k
    pad = dilation * (k - 1) // 2
    conv = params["params"]["conv_offset"]
    om = jax.lax.conv_general_dilated(
        x, conv["kernel"], (strides, strides), ((pad, pad), (pad, pad)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + conv["bias"]
    oh, ow = om.shape[1], om.shape[2]
    if modulated:
        off = np.asarray(om[..., : dg * 2 * nk]).reshape(b, oh, ow, dg, nk, 2)
        mask = np.asarray(jax.nn.sigmoid(om[..., dg * 2 * nk:])).reshape(
            b, oh, ow, dg, nk)
    else:
        off = np.asarray(om).reshape(b, oh, ow, dg, nk, 2)
        mask = None
    kernel = np.asarray(params["params"]["kernel"])
    ref = _naive_oracle(np.asarray(x), off, mask, kernel, strides,
                        dilation, dg)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_zero_offsets_equal_plain_conv():
    """Zero-init offset predictor => exactly a plain 3x3 conv (the
    init_offset invariant the reference relies on for finetuning)."""
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 8, 9, 6))
    m = DeformConv2d(features=4, kernel_size=3)
    params = m.init(jax.random.PRNGKey(4), x)
    out = m.apply(params, x)
    ref = jax.lax.conv_general_dilated(
        x, params["params"]["kernel"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_grouped_dense_lowering_matches_grouped_einsum():
    """ResNeXt path: block-diag dense lowering (cpf<=threshold) must equal
    the plain grouped contraction bit-for-bit in math."""
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (1, 6, 6, 8))
    kwargs = dict(features=8, kernel_size=3, feature_group_count=4,
                  modulated=True)
    m_dense = DeformConv2d(grouped_dense_max_width=16, **kwargs)
    m_group = DeformConv2d(grouped_dense_max_width=0, **kwargs)
    params = m_dense.init(jax.random.PRNGKey(6), x)
    params = _random_offset_params(params, jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(m_dense.apply(params, x)),
                               np.asarray(m_group.apply(params, x)),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("modulated", [False, True])
def test_quad_table_gather_matches_four_takes(modulated):
    """TPU.DCN_GATHER="quad" (one wide take from the overlapped 4-corner
    table) must be numerically identical to the per-corner form, including
    edge-clamped and fully out-of-bounds samples (offset scale 6 on a 7x6
    map throws many samples off the map), in both values and gradients."""
    key = jax.random.PRNGKey(11)
    b, h, w, c, f = 2, 7, 6, 4, 5
    x = jax.random.normal(key, (b, h, w, c))
    kwargs = dict(features=f, kernel_size=3, modulated=modulated)
    m_four = DeformConv2d(gather_mode="four", **kwargs)
    m_quad = DeformConv2d(gather_mode="quad", **kwargs)
    params = m_four.init(jax.random.PRNGKey(12), x)
    params = _random_offset_params(params, jax.random.PRNGKey(13), scale=6.0)

    out_four = np.asarray(m_four.apply(params, x))
    out_quad = np.asarray(m_quad.apply(params, x))
    np.testing.assert_allclose(out_quad, out_four, rtol=1e-5, atol=1e-5)

    def loss_fn(mod):
        return jax.grad(lambda p, xi: jnp.sum(mod.apply(p, xi) ** 2),
                        argnums=(0, 1))

    gp4, gx4 = loss_fn(m_four)(params, x)
    gpq, gxq = loss_fn(m_quad)(params, x)
    np.testing.assert_allclose(np.asarray(gxq), np.asarray(gx4),
                               rtol=1e-4, atol=1e-5)
    for (p4, l4), (pq, lq) in zip(
            jax.tree_util.tree_leaves_with_path(gp4),
            jax.tree_util.tree_leaves_with_path(gpq)):
        assert p4 == pq
        np.testing.assert_allclose(
            np.asarray(lq), np.asarray(l4), rtol=1e-4, atol=1e-5,
            err_msg=f"grad {jax.tree_util.keystr(p4)} diverges")


def test_gradients_flow_and_are_finite():
    """Checkpointed scan must still produce grads for kernel, offsets and
    input; offsets get nonzero grads once the predictor is non-degenerate."""
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 6, 6, 4))
    m = DeformConv2d(features=4, kernel_size=3, modulated=True)
    params = m.init(jax.random.PRNGKey(9), x)
    params = _random_offset_params(params, jax.random.PRNGKey(10))

    def loss(p, xi):
        return jnp.sum(m.apply(p, xi) ** 2)

    gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
    flat = jax.tree_util.tree_leaves(gp)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)
    assert bool(jnp.all(jnp.isfinite(gx)))
    g_off = gp["params"]["conv_offset"]["kernel"]
    assert float(jnp.abs(g_off).max()) > 0.0
    assert float(jnp.abs(gp["params"]["kernel"]).max()) > 0.0
