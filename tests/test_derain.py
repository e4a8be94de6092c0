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
    # clean must be spatially smooth: the KPN's softmaxed kernels are convex
    # neighborhood weights, so rain is only removable by interpolating from
    # neighbors (pure-noise "images" made this a coin-flip near base error)
    rng = np.random.RandomState(2)
    yy, xx = np.mgrid[0:32, 0:32].astype(np.float32) / 32.0
    base_img = 0.5 + 0.4 * np.sin(2 * np.pi * (yy + 0.5 * xx))
    clean = np.stack([np.clip(base_img + 0.05 * rng.randn(32, 32), 0, 1)
                      for _ in range(2)], 0).astype(np.float32)
    clean = np.repeat(clean[..., None], 3, axis=-1)
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
    assert final_err < base_err * 0.2, (final_err, base_err)


def test_ssim_matches_numpy_reference():
    """SSIM vs a direct numpy port of the reference pytorch_ssim formula
    (efficientderain-master/pytorch_ssim/__init__.py:7-37)."""
    import math

    from scipy.ndimage import convolve  # noqa: F401  (guard: scipy present?)
    from da_detect_tpu.ops.ssim import psnr, ssim

    rng = np.random.RandomState(3)
    a = rng.rand(2, 24, 32, 3).astype(np.float32)
    b = np.clip(a + rng.randn(2, 24, 32, 3).astype(np.float32) * 0.05, 0, 1)

    # numpy reference
    ws, sigma = 11, 1.5
    g = np.asarray([math.exp(-((x - ws // 2) ** 2) / (2 * sigma ** 2))
                    for x in range(ws)], np.float32)
    g /= g.sum()
    win = np.outer(g, g)

    def blur(x):
        out = np.zeros_like(x)
        for n in range(x.shape[0]):
            for c in range(x.shape[-1]):
                out[n, :, :, c] = convolve(x[n, :, :, c], win,
                                           mode="constant")
        return out

    mu1, mu2 = blur(a), blur(b)
    s1 = blur(a * a) - mu1 ** 2
    s2 = blur(b * b) - mu2 ** 2
    s12 = blur(a * b) - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    want = (((2 * mu1 * mu2 + c1) * (2 * s12 + c2))
            / ((mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))).mean()
    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4)
    # identity and monotonicity sanity
    assert float(ssim(jnp.asarray(a), jnp.asarray(a))) > 0.999
    assert float(psnr(jnp.asarray(a), jnp.asarray(a))) > 100


def test_refkpn_matches_reference_network():
    """Shared-weights forward parity vs the reference's OWN torch KPN
    (efficientderain-master/network.py:89-252, constructed with the vendored
    train.py defaults: color, burst_length=1, blind_est, kernel_size=[3],
    no sep_conv/attention/core_bias). Anchors the U-Net trunk, the bilinear
    up path, the 4-rate KernelConv tap/channel layout and conv_final."""
    import importlib.util
    import os

    import pytest

    torch = pytest.importorskip("torch")
    ref_py = "/root/reference/efficientderain-master/network.py"
    if not os.path.exists(ref_py):
        pytest.skip("reference tree not available")
    spec = importlib.util.spec_from_file_location("edr_network", ref_py)
    network = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(network)

    from da_detect_tpu.models.derain import KPNRef

    ref = network.KPN(color=True, burst_length=1, blind_est=True,
                      kernel_size=[3], sep_conv=False, channel_att=False,
                      spatial_att=False, upMode="bilinear", core_bias=False)
    g = torch.Generator().manual_seed(7)
    sd = {k: torch.randn(v.shape, generator=g) * 0.05
          for k, v in ref.state_dict().items()}
    ref.load_state_dict(sd)
    ref.eval()

    # torch -> flax name/layout mapping
    params = {}
    for k, v in sd.items():
        w = v.numpy()
        parts = k.split(".")
        if parts[0].startswith("conv") and parts[1] == "conv1":
            node = (parts[0], f"conv{int(parts[2]) // 2}")   # 0,2,4 -> 0,1,2
        else:
            node = (parts[0],)                               # outc, conv_final
        leaf = "kernel" if parts[-1] == "weight" else "bias"
        if leaf == "kernel":
            w = w.transpose(2, 3, 1, 0)                      # OIHW -> HWIO
        d = params
        for n in node:
            d = d.setdefault(n, {})
        d[leaf] = jnp.asarray(w)

    rng = np.random.RandomState(11)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        want = ref(xt, xt).numpy().transpose(0, 2, 3, 1)

    model = KPNRef()
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert jax.tree.structure(init["params"]) == jax.tree.structure(params), \
        "flax KPNRef tree drifted from the reference layout"
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    # float32 conv-accumulation-order noise on outputs of magnitude ~40:
    # tolerate abs error scaled to the output range, not per-element rtol
    # (near-zero elements otherwise dominate the relative error)
    np.testing.assert_allclose(got, want, rtol=1e-3,
                               atol=5e-4 * np.abs(want).max())


def test_rain_compositing_formula_pinned():
    """Pin rain_aug's screen compositing to the reference formula
    ``img + rain - img*rain`` on [0,1] floats then *255 (reference
    generate_rainy_cityscape.py:103-121, rain_aug), on a fixed mask with
    darken=1.0 (darken<1 is our documented extension, off by default in
    the parity sense)."""
    from da_detect_tpu.tools.generate_rainy_dataset import rain_aug

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (16, 20, 3)).astype(np.uint8)
    mask = rng.rand(16, 20).astype(np.float32)
    x = img.astype(np.float32) / 255.0
    want = np.clip(x + mask[..., None] - x * mask[..., None], 0.0, 1.0) * 255.0
    got = rain_aug(img, mask, darken=1.0)
    np.testing.assert_allclose(got, want.astype(np.uint8), atol=1)


def test_derain_trainer_end_to_end(tmp_path):
    """The CLI trainer learns on a tiny synthetic-rain dataset and writes a
    checkpoint (reference trainer.py Pre_train path)."""
    import cv2

    from da_detect_tpu.tools import train_derain

    rng = np.random.RandomState(0)
    clean_dir = tmp_path / "clean"
    clean_dir.mkdir()
    for i in range(4):
        img = np.zeros((80, 96, 3), np.uint8)
        cv2.circle(img, (20 + 10 * i, 40), 14, (40 + 40 * i, 160, 220), -1)
        img = (img.astype(np.float32)
               + rng.randint(0, 60, (80, 96, 3))).clip(0, 255)
        cv2.imwrite(str(clean_dir / f"{i}.png"), img.astype(np.uint8))

    out = tmp_path / "out"
    train_derain.main(["--clean-dir", str(clean_dir), "--iters", "6",
                       "--batch", "2", "--crop", "64", "--val-period", "6",
                       "--log-period", "3", "--out", str(out)])
    assert (out / "kpn_final.npz").exists()
