"""KPN deraining net: per-pixel kernel application semantics + a short
overfit check that the net can partially undo synthetic rain."""

import jax
import jax.numpy as jnp
import numpy as np

from da_detect_tpu.models.derain import KPN, apply_per_pixel_kernels, derain_loss


def test_identity_kernel_application():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 12, 16, 3).astype(np.float32))
    k = np.zeros((1, 12, 16, 25), np.float32)
    k[..., 12] = 1.0  # center tap of the 5x5 kernel
    out = apply_per_pixel_kernels(x, jnp.asarray(k), 5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-6)


def test_shift_kernel_application():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 12, 16, 1).astype(np.float32))
    k = np.zeros((1, 12, 16, 25), np.float32)
    k[..., 0] = 1.0  # (dy=0, dx=0) tap = top-left of the padded window
    out = np.asarray(apply_per_pixel_kernels(x, jnp.asarray(k), 5))
    # selecting tap (0,0) shifts the image by (-2, -2)
    np.testing.assert_allclose(out[0, 2:, 2:, 0], np.asarray(x)[0, :-2, :-2, 0],
                               rtol=1e-6)


def test_kpn_reduces_rain():
    rng = np.random.RandomState(2)
    clean = rng.rand(2, 32, 32, 3).astype(np.float32)
    rain = clean.copy()
    rain[:, :, ::4, :] = np.minimum(rain[:, :, ::4, :] + 0.7, 1.0)
    clean_j, rain_j = jnp.asarray(clean), jnp.asarray(rain)

    model = KPN(base=8)
    variables = model.init(jax.random.PRNGKey(0), rain_j)
    import optax
    tx = optax.adam(1e-3)
    opt = tx.init(variables["params"])

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            pred = model.apply({"params": p}, rain_j)
            return derain_loss(pred, clean_j)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    params = variables["params"]
    losses = []
    for _ in range(200):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    base_err = float(jnp.mean((rain_j - clean_j) ** 2))
    final_pred = model.apply({"params": params}, rain_j)
    final_err = float(jnp.mean((final_pred - clean_j) ** 2))
    assert losses[-1] < losses[0] * 0.5, losses[:3] + losses[-3:]
    assert final_err < base_err, (final_err, base_err)
