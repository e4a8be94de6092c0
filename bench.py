"""Benchmark: triplet-DA train throughput on the flagship config.

Measures steady-state images/sec of the full jitted train step (R-50-C4,
608x1216 canvas, 256-ROI batch, bf16 compute, one (src, pos, neg) triple per
step = 3 images) on the attached TPU chip, against the reference anchor of
2.48 images/s/GPU (V100 Faster R-CNN R-50-C4 train, 0.4036 s/iter at
1 im/GPU — MODEL_ZOO.md:21; see BASELINE.md).

The measured step is the REFERENCE-EXACT WACV method: ALIGNMENT=True
(tools/train_net_triplet.py:118-179 / generalized_rcnn.py:104-114 there),
i.e. the aligned instance-triplet re-pools the positive slice's proposals
from all three domains' features each step.

Besides the headline, the JSON line carries first-class chip-efficiency
fields:
* ``flops_per_step`` — XLA cost_analysis FLOPs of the compiled step;
* ``peak_tflops_measured`` — this chip's bf16 matmul peak, measured inline
  (4096^3 probe, same as scripts/bench_roofline.py) rather than datasheet;
* ``mfu`` — flops_per_step / (step_time * measured peak);
* ``unaligned_images_per_sec`` / ``aligned_k8_images_per_sec`` — the
  ALIGNMENT=False variant and the aligned k=8 (24-image) scaling row, so
  round-over-round comparisons don't rename metrics.

Secondary metrics are budgeted: if the extra compiles would push total
bench time past ~20 min they are skipped (reported as null) — the primary
headline always prints.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_IMG_PER_SEC = 2.48
TIME_BUDGET_S = 20 * 60


def _measure_step(step, state, sample, iters=20, warmup=3):
    """Thread state through (donation-compatible); returns s/step."""
    state, metrics = step(state, *sample)
    float(metrics["loss_total"])  # honest barrier (host fetch)
    for _ in range(warmup):
        state, metrics = step(state, *sample)
    float(metrics["loss_total"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, *sample)
    final_loss = float(metrics["loss_total"])  # barrier inside timed region
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(final_loss)
    return dt


def _measured_peak_tflops():
    """bf16 4096^3 matmul probe (scripts/bench_roofline.py)."""
    import jax
    import jax.numpy as jnp
    n, reps = 4096, 16
    a = jnp.zeros((n, n), jnp.bfloat16)
    b = jnp.zeros((n, n), jnp.bfloat16)

    def mm(a, b):
        def body(c, _):
            y = (a * c) @ b
            return (jnp.max(jnp.abs(y)) * 0 + 1).astype(a.dtype), None
        c, _ = jax.lax.scan(body, jnp.ones((), a.dtype), None, length=reps)
        return jnp.sum(c.astype(jnp.float32))

    f = jax.jit(mm)
    float(f(a, b))
    t0 = time.perf_counter()
    for _ in range(4):
        r = f(a, b)
    float(r)
    dt = (time.perf_counter() - t0) / 4 / reps
    return 2 * n ** 3 / dt / 1e12


def _flops_of(jitted_step, args):
    """XLA cost_analysis FLOPs of the compiled train step, if available."""
    try:
        compiled = jitted_step.lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


def _build(cfg_kwargs, k, aligned):
    import jax
    from __graft_entry__ import _batch, _flagship_cfg
    from da_detect_tpu.engine.trainer import create_train_state, make_train_step
    from da_detect_tpu.models import build_detection_model

    cfg = _flagship_cfg(**cfg_kwargs)
    cfg.TPU.MAX_GT_BOXES = 64
    cfg.SOLVER.IMS_PER_BATCH = 2 * k
    model = build_detection_model(cfg)
    sample = []
    for d, src in ((0, True), (1, False), (2, False)):
        b, t = _batch(cfg, k, seed=d, is_source=src)
        sample += [b, t]
    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                   tuple(sample), "cosine")
    raw_step = make_train_step(model, tx, aligned=aligned)
    return state, raw_step, tuple(sample)


def main():
    from da_detect_tpu.utils.env import setup_environment
    setup_environment()

    t_start = time.perf_counter()
    cfg_kwargs = dict(canvas=(608, 1216),
                      train_tops=(12000, 2000), test_tops=(6000, 1000))

    # headline: aligned, k=1 (the parity config)
    state, step, sample = _build(cfg_kwargs, k=1, aligned=True)
    # FLOPs read off the lowered step BEFORE running it (running donates
    # the state buffers; lowering shares the jit executable cache)
    flops = _flops_of(step, (state,) + sample)
    dt = _measure_step(step, state, sample)
    images_per_sec = 3 / dt

    out = {
        "metric": "da_triplet_aligned_train_images_per_sec",
        "value": round(images_per_sec, 3),
        "unit": "images/s/chip",
        "vs_baseline": round(images_per_sec / BASELINE_IMG_PER_SEC, 3),
        "step_ms": round(dt * 1e3, 2),
        "mfu": None,
        "flops_per_step": None,
        "peak_tflops_measured": None,
        "unaligned_images_per_sec": None,
        "aligned_k8_images_per_sec": None,
    }

    # chip efficiency: measured peak + compiled-step FLOPs -> MFU
    try:
        peak = _measured_peak_tflops()
        out["peak_tflops_measured"] = round(peak, 1)
        if flops:
            out["flops_per_step"] = flops
            out["mfu"] = round(flops / (dt * peak * 1e12), 4)
    except Exception:
        pass

    # scaling rows (budgeted: each is an extra full-step compile)
    try:
        if time.perf_counter() - t_start < TIME_BUDGET_S:
            st_u, step_u, sample_u = _build(cfg_kwargs, k=1, aligned=False)
            dt_u = _measure_step(step_u, st_u, sample_u)
            out["unaligned_images_per_sec"] = round(3 / dt_u, 3)
    except Exception:
        pass
    try:
        if time.perf_counter() - t_start < TIME_BUDGET_S:
            st_8, step_8, sample_8 = _build(cfg_kwargs, k=8, aligned=True)
            dt_8 = _measure_step(step_8, st_8, sample_8, iters=8, warmup=2)
            out["aligned_k8_images_per_sec"] = round(24 / dt_8, 3)
    except Exception:
        pass

    print(json.dumps(out))


if __name__ == "__main__":
    main()
