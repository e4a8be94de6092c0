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
  (4096^3 probe, same as scripts/bench_roofline.py);
* ``mfu`` — flops_per_step / (step_time * measured peak);
* ``mfu_vs_datasheet`` — same numerator over the v5e datasheet 197 TF/s
  bf16 peak (the honest-comparison twin of ``mfu``; PERFORMANCE.md:75-77);
* ``pipeline_images_per_sec`` — the SYSTEM number: the real data/build.py
  loader (png decode + native prep + fixed-shape batching on host threads)
  feeding the same jitted step for ~200 steps, on cityscapes-sized
  (1024x2048) synthetic images written to disk. Matches the reference's
  data_time meter concept (engine/trainer.py:199,244-246 there);
* ``inference_images_per_sec`` / ``inference_mfu`` — the eval forward at
  the test canvas, batch 1 (the reference's 0.1713 s/im V100 anchor);
* ``unaligned_images_per_sec`` / ``aligned_k8_images_per_sec`` — the
  ALIGNMENT=False variant and the aligned k=8 (24-image) scaling row;
* ``share_pool_images_per_sec`` / ``share_pool_k8_images_per_sec`` — the
  TPU.SHARE_POSITIVE_POOL variant (drops one of the three aligned re-pool
  passes; loss-equivalence pinned by tests/test_model_build.py:122).

Secondary metrics are budgeted: each section declares an expected cost and
is skipped up front (reported as null) if it would push total bench time
past the budget (``BENCH_TIME_BUDGET_S``, default 26 min) — the primary
headline always prints. Section start times go to stderr. Once the
headline is measured, SIGTERM/SIGALRM flush the JSON line with whatever
has been measured so far, so an external timeout can never erase the run.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import tempfile
import time

import numpy as np

BASELINE_IMG_PER_SEC = 2.48
DATASHEET_TFLOPS = 197.0  # TPU v5e bf16 peak (PERFORMANCE.md:75-77)
TIME_BUDGET_S = int(os.environ.get("BENCH_TIME_BUDGET_S", 26 * 60))

_T0 = time.perf_counter()


def _mark(msg):
    """Section timestamps on stderr (progress + post-mortem attribution)."""
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


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


def _build(cfg_kwargs, k, aligned, share_pool=False):
    import jax
    from __graft_entry__ import _batch, _flagship_cfg
    from da_detect_tpu.engine.trainer import create_train_state, make_train_step
    from da_detect_tpu.models import build_detection_model

    cfg = _flagship_cfg(**cfg_kwargs)
    cfg.TPU.MAX_GT_BOXES = 64
    cfg.SOLVER.IMS_PER_BATCH = 2 * k
    cfg.TPU.SHARE_POSITIVE_POOL = share_pool
    model = build_detection_model(cfg)
    sample = []
    for d, src in ((0, True), (1, False), (2, False)):
        b, t = _batch(cfg, k, seed=d, is_source=src)
        sample += [b, t]
    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                   tuple(sample), "cosine")
    raw_step = make_train_step(model, tx, aligned=aligned)
    return state, raw_step, tuple(sample)


def _pipeline_rate(cfg_kwargs, k=1, steps=200, n_images=24,
                   disk_hw=(1024, 2048), resize=(600, 1200), max_gt=64):
    """SYSTEM throughput: the real host pipeline (png decode, native prep,
    aligned-triplet batching, thread prefetch) feeding the jitted step.
    Cityscapes-sized 1024x2048 images are written to disk so the host does
    real decode work; the device program is identical to the headline's."""
    import jax
    from __graft_entry__ import _flagship_cfg
    from da_detect_tpu.data import make_data_loader_da
    from da_detect_tpu.engine.trainer import create_train_state, make_train_step
    from da_detect_tpu.models import build_detection_model
    from da_detect_tpu.tools.sanity_check import build_synthetic

    root = tempfile.mkdtemp(prefix="dd_bench_data_")
    # "natural" texture: PNGs compress like real Cityscapes leftImg8bit
    # files (~1 byte/px) instead of raw iid noise (~2.4 byte/px) — the host
    # decode work should match real data, not a pathological worst case
    build_synthetic(root, n_images, seed=0, hw=disk_hw, texture="natural")
    prev_data_dir = os.environ.get("DA_DETECT_DATA_DIR")
    os.environ["DA_DETECT_DATA_DIR"] = root
    try:
        cfg = _flagship_cfg(**cfg_kwargs)
        cfg.TPU.MAX_GT_BOXES = max_gt
        cfg.SOLVER.IMS_PER_BATCH = 2 * k
        cfg.INPUT.MIN_SIZE_TRAIN = (resize[0],)
        cfg.INPUT.MAX_SIZE_TRAIN = resize[1]
        cfg.DATASETS.SOURCE_TRAIN = ("sanity_clean_cocostyle",)
        cfg.DATASETS.TARGET_TRAIN = ("sanity_foggy_cocostyle",)
        cfg.DATASETS.TARGET_TRAIN_negative = ("sanity_rainy_cocostyle",)
        model = build_detection_model(cfg)
        # the production host-feed transport: packed single-transfer batches
        # (TPU.PACKED_TRANSPORT; see data/packing.py) — one device_put per
        # step from the prefetch thread instead of one per input leaf
        loader = make_data_loader_da(cfg, aligned=True, seed=0, packed=True)
        it = iter(loader)
        buf, packer = next(it)
        import jax.random as jrandom
        init_args = packer.unpack_np(np.asarray(jax.device_get(buf)))
        state, tx = create_train_state(cfg, model, jrandom.PRNGKey(0),
                                       init_args, "cosine")
        step = make_train_step(model, tx, aligned=True, packed=True)
        state, m = step(state, buf, packer)  # compile
        float(m["loss_total"])
        for _ in range(5):  # warm the prefetch queue + steady state
            state, m = step(state, *next(it))
        float(m["loss_total"])
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = step(state, *next(it))
        final = float(m["loss_total"])  # barrier inside the timed region
        dt = (time.perf_counter() - t0) / steps
        assert np.isfinite(final)
        loader.close()
        return 3 * k / dt
    finally:
        if prev_data_dir is None:
            os.environ.pop("DA_DETECT_DATA_DIR", None)
        else:
            os.environ["DA_DETECT_DATA_DIR"] = prev_data_dir


def _inference_rate(cfg_kwargs):
    """Eval forward at the test canvas, batch 1 (reference V100 anchor is
    0.1713 s/im, MODEL_ZOO.md:21). Returns (images/s, flops or None)."""
    import jax
    from __graft_entry__ import _batch, _flagship_cfg
    from da_detect_tpu.models import build_detection_model

    cfg = _flagship_cfg(**cfg_kwargs)
    model = build_detection_model(cfg)
    batch, _ = _batch(cfg, 1)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch)
    fwd = jax.jit(lambda v, b: model.apply(v, b))
    flops = None
    try:
        ca = fwd.lower(variables, batch).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca["flops"])
    except Exception:
        pass
    out = fwd(variables, batch)
    jax.block_until_ready(out)
    for _ in range(5):
        out = fwd(variables, batch)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    iters = 50
    for _ in range(iters):
        out = fwd(variables, batch)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return 1.0 / dt, flops, dt


def main():
    from da_detect_tpu.utils.env import setup_environment
    setup_environment()

    t_start = time.perf_counter()

    def budget_left(need_s=0.0):
        """True if a section expected to take ``need_s`` still fits the
        budget. Sections are SKIPPED up front rather than started late:
        a cold full-step compile over the relay can run many minutes, so
        an in-progress section can overshoot any budget check that only
        looks at elapsed time."""
        return time.perf_counter() - t_start + need_s < TIME_BUDGET_S

    cfg_kwargs = dict(canvas=(608, 1216),
                      train_tops=(12000, 2000), test_tops=(6000, 1000))

    # headline: aligned, k=1 (the parity config)
    _mark("build+compile headline (aligned k=1)")
    state, step, sample = _build(cfg_kwargs, k=1, aligned=True)
    # FLOPs read off the lowered step BEFORE running it (running donates
    # the state buffers; lowering shares the jit executable cache)
    flops = _flops_of(step, (state,) + sample)
    dt = _measure_step(step, state, sample)
    images_per_sec = 3 / dt
    _mark(f"headline done: {3 / dt:.2f} img/s")

    out = {
        "metric": "da_triplet_aligned_train_images_per_sec",
        "value": round(images_per_sec, 3),
        "unit": "images/s/chip",
        "vs_baseline": round(images_per_sec / BASELINE_IMG_PER_SEC, 3),
        "step_ms": round(dt * 1e3, 2),
        # flops is independent of the peak probe — record it unconditionally
        "flops_per_step": flops,
        "mfu": None,
        "mfu_vs_datasheet": (round(flops / (dt * DATASHEET_TFLOPS * 1e12), 4)
                             if flops else None),
        "peak_tflops_measured": None,
        "pipeline_images_per_sec": None,
        "inference_images_per_sec": None,
        "inference_mfu": None,
        "unaligned_images_per_sec": None,
        "aligned_k8_images_per_sec": None,
        "share_pool_images_per_sec": None,
        "share_pool_k8_images_per_sec": None,
    }

    # From here on the headline is in hand: if an external timeout kills
    # us (SIGTERM/SIGALRM) mid-section, flush the JSON measured so far —
    # the driver must always receive the line.
    def _flush_and_exit(signum, frame):
        _mark(f"signal {signum}: flushing partial JSON")
        print(json.dumps(out), flush=True)
        os._exit(0)

    signal.signal(signal.SIGTERM, _flush_and_exit)
    signal.signal(signal.SIGALRM, _flush_and_exit)
    signal.alarm(max(60, TIME_BUDGET_S + 8 * 60))  # hard backstop

    # chip efficiency: measured peak + compiled-step FLOPs -> MFU
    try:
        _mark("peak probe")
        peak = _measured_peak_tflops()
        out["peak_tflops_measured"] = round(peak, 1)
        if flops:
            out["mfu"] = round(flops / (dt * peak * 1e12), 4)
    except Exception:
        peak = None

    # the SYSTEM number: loader-fed sustained throughput (same device
    # program as the headline; any gap is host-pipeline overhead).
    # need_s: packed-variant step compile (cold) + data gen + 200 steps.
    try:
        if budget_left(360):
            _mark("pipeline (loader-fed) section")
            out["pipeline_images_per_sec"] = round(
                _pipeline_rate(cfg_kwargs, k=1), 3)
    except Exception:
        pass

    # inference path (cheap compile): images/s + its own MFU
    try:
        if budget_left(120):
            _mark("inference section")
            inf_rate, inf_flops, inf_dt = _inference_rate(cfg_kwargs)
            out["inference_images_per_sec"] = round(inf_rate, 3)
            if inf_flops and peak:
                out["inference_mfu"] = round(
                    inf_flops / (inf_dt * peak * 1e12), 4)
    except Exception:
        pass

    # scaling rows (budgeted: each is an extra full-step compile; cold
    # compiles over the relay run ~3-5 min, so each row must leave room)
    for key, kwargs, n_img, iters in (
            ("aligned_k8_images_per_sec", dict(k=8, aligned=True), 24, 8),
            ("share_pool_k8_images_per_sec",
             dict(k=8, aligned=True, share_pool=True), 24, 8),
            ("share_pool_images_per_sec",
             dict(k=1, aligned=True, share_pool=True), 3, 20),
            ("unaligned_images_per_sec", dict(k=1, aligned=False), 3, 20),
    ):
        try:
            if budget_left(300):
                _mark(f"scaling row {key}")
                st, stp, smp = _build(cfg_kwargs, **kwargs)
                dt_x = _measure_step(stp, st, smp, iters=iters, warmup=2)
                out[key] = round(n_img / dt_x, 3)
        except Exception:
            pass

    _mark("done")
    signal.alarm(0)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
