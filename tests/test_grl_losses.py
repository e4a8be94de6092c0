import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from da_detect_tpu.ops.grl import gradient_scalar, grad_reverse
from da_detect_tpu.ops.losses import (bce_with_logits, sigmoid_focal_loss,
                                      smooth_l1_loss, softmax_cross_entropy)


def test_grl_forward_identity():
    x = jnp.arange(6.0).reshape(2, 3)
    np.testing.assert_array_equal(np.asarray(gradient_scalar(x, -0.5)), np.asarray(x))


def test_grl_gradient_scaled():
    x = jnp.arange(6.0).reshape(2, 3)
    g = jax.grad(lambda y: jnp.sum(gradient_scalar(y, -0.5) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(2 * x) * -0.5, rtol=1e-6)
    g2 = jax.grad(lambda y: jnp.sum(grad_reverse(y, 0.1)))(x)
    np.testing.assert_allclose(np.asarray(g2), -0.1 * np.ones_like(g2), rtol=1e-6)


def test_grl_traced_weight():
    x = jnp.ones((3,))

    @jax.jit
    def f(x, w):
        return jnp.sum(gradient_scalar(x, w * 2.0))

    g = jax.grad(f)(x, jnp.asarray(0.25))
    np.testing.assert_allclose(np.asarray(g), 0.5 * np.ones(3), rtol=1e-6)


def test_smooth_l1_vs_torch():
    rng = np.random.RandomState(0)
    a = rng.randn(40).astype(np.float32)
    b = rng.randn(40).astype(np.float32)
    beta = 1.0 / 9
    want = F.smooth_l1_loss(torch.tensor(a), torch.tensor(b), beta=beta,
                            reduction="sum").item()
    got = float(smooth_l1_loss(jnp.asarray(a), jnp.asarray(b), beta=beta))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bce_vs_torch():
    rng = np.random.RandomState(1)
    logits = rng.randn(30).astype(np.float32) * 3
    targets = rng.randint(0, 2, 30).astype(np.float32)
    want = F.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(targets)).item()
    got = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_focal_loss_vs_reference_formula():
    """Oracle: direct per-class formula with the class-index convention of the
    reference CPU implementation (layers/sigmoid_focal_loss.py:40-53)."""
    rng = np.random.RandomState(2)
    n, c = 17, 5
    logits = rng.randn(n, c).astype(np.float32)
    targets = rng.randint(0, c + 1, n)
    gamma, alpha = 2.0, 0.25
    t = torch.tensor(targets)
    lg = torch.tensor(logits)
    class_range = torch.arange(1, c + 1).unsqueeze(0)
    tt = t.unsqueeze(1)
    p = torch.sigmoid(lg)
    term1 = (1 - p) ** gamma * torch.log(p)
    term2 = p ** gamma * torch.log(1 - p)
    want = (-(tt == class_range).float() * term1 * alpha
            - ((tt != class_range) * (tt >= 0)).float() * term2 * (1 - alpha)).sum(1)
    got = np.asarray(sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets),
                                        gamma, alpha))
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-6)


def test_softmax_ce_vs_torch():
    rng = np.random.RandomState(3)
    logits = rng.randn(12, 7).astype(np.float32)
    labels = rng.randint(0, 7, 12)
    want = F.cross_entropy(torch.tensor(logits), torch.tensor(labels)).item()
    got = float(softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # masked variant
    w = (np.arange(12) % 2).astype(np.float32)
    want_m = F.cross_entropy(torch.tensor(logits[w > 0]), torch.tensor(labels[w > 0])).item()
    got_m = float(softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                        jnp.asarray(w)))
    np.testing.assert_allclose(got_m, want_m, rtol=1e-5)
