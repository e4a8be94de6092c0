"""Train the KPN deraining network (TPU-native counterpart of the
reference's EfficientDeRain harness: efficientderain-master/train.py +
trainer.py:19-170 Pre_train + validation.py).

Pairs rainy/clean images by filename from two directories (or synthesizes
rain on the fly from clean images with the Garg-Nayar overlay used to build
Rainy-Cityscapes — tools/generate_rainy_dataset.py), random-crops to a fixed
static shape, and runs one jitted Adam step per iteration. Loss mirrors the
reference's converged-phase objective (L2 + gradient-L1, derain_loss) with
an optional 1-SSIM term (trainer.py:40-45); LR decays linearly after
--lr-decrease-at like adjust_learning_rate (trainer.py:75-82). Validation
reports PSNR/SSIM.

    python -m da_detect_tpu.tools.train_derain --clean-dir ... \
        [--rainy-dir ...] --iters 2000 --crop 224 --out ./derain_ckpt
"""

from __future__ import annotations

import argparse
import glob
import os
import time

import numpy as np

from ..utils.logging_utils import setup_logger


def _load_pairs(clean_dir: str, rainy_dir: str | None, exts=(".png", ".jpg")):
    cleans = sorted(p for p in glob.glob(os.path.join(clean_dir, "**", "*"),
                                         recursive=True)
                    if p.lower().endswith(exts))
    if not cleans:
        raise FileNotFoundError(f"no images under {clean_dir}")
    if rainy_dir is None:
        return [(None, c) for c in cleans]
    pairs = []
    for c in cleans:
        r = os.path.join(rainy_dir, os.path.relpath(c, clean_dir))
        if os.path.exists(r):
            pairs.append((r, c))
    if not pairs:
        raise FileNotFoundError("no filename-aligned rainy/clean pairs")
    return pairs


def _read_unit(path: str) -> np.ndarray:
    from ..data.transforms import load_image_bgr
    return load_image_bgr(path)[..., ::-1].astype(np.float32) / 255.0


def _sample_batch(pairs, crop: int, batch: int, rng: np.random.RandomState):
    from .generate_rainy_dataset import rain_aug, synth_rain_mask
    rainy_b = np.empty((batch, crop, crop, 3), np.float32)
    clean_b = np.empty((batch, crop, crop, 3), np.float32)
    for i in range(batch):
        rp, cp = pairs[rng.randint(len(pairs))]
        clean = _read_unit(cp)
        rainy = _read_unit(rp) if rp is not None else None
        h, w = clean.shape[:2]
        if h < crop or w < crop:
            py, px = max(0, crop - h), max(0, crop - w)
            clean = np.pad(clean, ((0, py), (0, px), (0, 0)), mode="edge")
            if rainy is not None:
                rainy = np.pad(rainy, ((0, py), (0, px), (0, 0)),
                               mode="edge")
            h, w = clean.shape[:2]
        y = rng.randint(h - crop + 1)
        x = rng.randint(w - crop + 1)
        clean = clean[y:y + crop, x:x + crop]
        if rainy is None:
            mask = synth_rain_mask(crop, crop, rng)
            rainy = rain_aug((clean * 255).astype(np.uint8), mask) / 255.0
        else:
            rainy = rainy[y:y + crop, x:x + crop]
        rainy_b[i], clean_b[i] = rainy, clean
    return rainy_b, clean_b


def make_train_step(model, tx, ssim_weight: float):
    import jax
    import optax

    from ..models.derain import derain_loss
    from ..ops.ssim import ssim

    def step(params, opt_state, rainy, clean):
        def loss_fn(p):
            pred = model.apply({"params": p}, rainy)
            loss = derain_loss(pred, clean)
            if ssim_weight:
                loss = loss + ssim_weight * (1.0 - ssim(pred, clean))
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--clean-dir", required=True)
    ap.add_argument("--rainy-dir", default=None,
                    help="paired rainy images; omit to synthesize rain")
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--crop", type=int, default=224)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--lr-decrease-at", type=float, default=0.5,
                    help="fraction of iters after which LR decays linearly")
    ap.add_argument("--ssim-weight", type=float, default=0.0)
    ap.add_argument("--val-period", type=int, default=500)
    ap.add_argument("--log-period", type=int, default=20)
    ap.add_argument("--out", default="./derain_out")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from ..models.derain import KPN
    from ..ops.ssim import psnr, ssim

    os.makedirs(args.out, exist_ok=True)
    log = setup_logger("da_detect_tpu.derain", args.out)
    pairs = _load_pairs(args.clean_dir, args.rainy_dir)
    n_val = max(1, min(8, len(pairs) // 10))
    val_pairs, train_pairs = pairs[:n_val], pairs[n_val:] or pairs
    log.info("%d train pairs, %d val pairs", len(train_pairs), len(val_pairs))

    rng = np.random.RandomState(args.seed)
    model = KPN()
    sample = jnp.zeros((args.batch, args.crop, args.crop, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(args.seed),
                                 sample)["params"]

    decay_start = int(args.iters * args.lr_decrease_at)
    sched = optax.join_schedules(
        [optax.constant_schedule(args.lr),
         optax.linear_schedule(args.lr, 0.0, args.iters - decay_start)],
        [decay_start])
    tx = optax.adam(sched, b1=0.5, b2=0.999)  # reference betas train.py opts
    opt_state = tx.init(params)
    step = make_train_step(model, tx, args.ssim_weight)

    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))

    def validate(params):
        ps, ss = [], []
        vrng = np.random.RandomState(1234)
        for _ in range(len(val_pairs)):
            rainy, clean = _sample_batch(val_pairs, args.crop, 1, vrng)
            pred = fwd(params, jnp.asarray(rainy))
            ps.append(float(psnr(pred, jnp.asarray(clean))))
            ss.append(float(ssim(pred, jnp.asarray(clean))))
        return float(np.mean(ps)), float(np.mean(ss))

    t0 = time.perf_counter()
    for it in range(1, args.iters + 1):
        rainy, clean = _sample_batch(train_pairs, args.crop, args.batch, rng)
        params, opt_state, loss = step(params, opt_state, jnp.asarray(rainy),
                                       jnp.asarray(clean))
        if it % args.log_period == 0:
            log.info("iter %d/%d loss %.4f (%.2f it/s)", it, args.iters,
                     float(loss), it / (time.perf_counter() - t0))
        if it % args.val_period == 0 or it == args.iters:
            p, s = validate(params)
            log.info("iter %d: val PSNR %.2f dB, SSIM %.4f", it, p, s)

    out = os.path.join(args.out, "kpn_final.npz")
    flat = {jax.tree_util.keystr(path): np.asarray(v) for path, v in
            jax.tree_util.tree_flatten_with_path(params)[0]}
    np.savez(out, **flat)
    log.info("saved %s", out)


if __name__ == "__main__":
    main()
