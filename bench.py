"""Benchmark: triplet-DA train throughput on the flagship config.

Measures steady-state images/sec of the full jitted train step (R-50-C4,
608x1216 canvas, 256-ROI batch, bf16 compute, one (src, pos, neg) triple per
step = 3 images) on the attached TPU chip, against the reference anchor of
2.48 images/s/GPU (V100 Faster R-CNN R-50-C4 train, 0.4036 s/iter at
1 im/GPU — MODEL_ZOO.md:21; see BASELINE.md).

The measured step is the WACV ALIGNMENT=True method
(tools/train_net_triplet.py:118-179 / generalized_rcnn.py:104-114 there)
at the production default config — TPU.SHARE_POSITIVE_POOL on, which
replaces one of the three aligned re-pool passes with the detection pass's
pooled target features (distribution-equivalent; gate:
tests/test_model_build.py:122). ``aligned_noshare_images_per_sec`` is the
reference-exact independent-draw variant (the r01-r04 headline config).

Besides the headline, the JSON line carries first-class chip-efficiency
and SYSTEM fields:
* ``flops_per_step`` — XLA cost_analysis FLOPs of the compiled step;
* ``peak_tflops_measured`` — this chip's bf16 matmul peak, measured inline
  (4096^3 probe, same as scripts/bench_roofline.py);
* ``mfu`` — flops_per_step / (step_time * measured peak);
* ``mfu_vs_datasheet`` — same numerator over the v5e datasheet 197 TF/s
  bf16 peak (the honest-comparison twin of ``mfu``; PERFORMANCE.md:75-77);
* ``pipeline_images_per_sec`` (cold) / ``pipeline_warm_images_per_sec`` —
  the SYSTEM numbers: the real data/build.py loader feeding the same
  jitted step on cityscapes-sized (1024x2048) synthetic PNGs on disk.
  Cold decodes + preps every image every step (the reference's every-epoch
  behavior, its data_time meter — engine/trainer.py:199,244-246 there);
  warm reads the pre-staged prepped-canvas cache (data/staging.py,
  tools/stage_dataset.py). ``pipeline_{cold,warm}_host_ms`` itemize the
  producer-thread budget per step (decode/prep/stage/stack/pack/put);
* ``inference_images_per_sec`` / ``inference_mfu`` — device-resident eval
  forward at the test canvas, batch 1 (reference anchor 0.1713 s/im);
* ``inference_pipeline_{,warm_}images_per_sec`` — the loader-fed eval
  SYSTEM numbers (decode -> forward -> unpad/rescale, the span the
  reference times at engine/inference.py:104-110 there);
* ``unaligned_images_per_sec`` / ``aligned_k8_images_per_sec`` — the
  ALIGNMENT=False variant and the aligned k=8 (24-image) scaling row.

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


def _wire_mbps(mb: int = 32, reps: int = 3) -> float:
    """Host->device transfer bandwidth (the loader-fed bound on relayed
    attachments). Barrier = fetching one element through a jitted index
    (block_until_ready is unreliable over the relay, TROUBLESHOOTING.md)."""
    import jax
    import jax.numpy as jnp
    a = np.random.randint(0, 255, mb << 20, dtype=np.uint8)
    probe = jax.jit(lambda x: x[0].astype(jnp.int32))
    d = jax.device_put(a)
    int(probe(d))  # warm the probe program
    t0 = time.perf_counter()
    for _ in range(reps):
        d = jax.device_put(a)
        int(probe(d))
    return mb * reps / (time.perf_counter() - t0)


def _build(cfg_kwargs, k, aligned, share_pool=None):
    import jax
    from __graft_entry__ import _batch, _flagship_cfg
    from da_detect_tpu.engine.trainer import create_train_state, make_train_step
    from da_detect_tpu.models import build_detection_model

    cfg = _flagship_cfg(**cfg_kwargs)
    cfg.TPU.MAX_GT_BOXES = 64
    cfg.SOLVER.IMS_PER_BATCH = 2 * k
    if share_pool is not None:  # None = production default (True under
        cfg.TPU.SHARE_POSITIVE_POOL = share_pool  # the aligned path)
    model = build_detection_model(cfg)
    sample = []
    for d, src in ((0, True), (1, False), (2, False)):
        b, t = _batch(cfg, k, seed=d, is_source=src)
        sample += [b, t]
    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                   tuple(sample), "cosine")
    raw_step = make_train_step(model, tx, aligned=aligned)
    return state, raw_step, tuple(sample)


def _host_ms(stats: dict) -> dict:
    """loader.stats -> per-step host milliseconds, itemized."""
    n = max(stats.get("batches", 0), 1)
    out = {k[:-2] + "_ms": round(1e3 * v / n, 1)
           for k, v in stats.items() if k.endswith("_s")}
    for k in ("stage_hits", "stage_misses"):
        if k in stats:
            out[k] = stats[k]
    return out


def _bench_data_cfg(cfg_kwargs, k, n_images, disk_hw, resize, max_gt):
    """Synthetic cityscapes-sized dataset on disk + the flagship train cfg
    pointed at it. Returns (cfg, restore_fn)."""
    import os as _os

    from __graft_entry__ import _flagship_cfg
    from da_detect_tpu.tools.sanity_check import build_synthetic

    root = tempfile.mkdtemp(prefix="dd_bench_data_")
    # "natural" texture: PNGs compress like real Cityscapes leftImg8bit
    # files (~1 byte/px) instead of raw iid noise (~2.4 byte/px) — the host
    # decode work should match real data, not a pathological worst case
    build_synthetic(root, n_images, seed=0, hw=disk_hw, texture="natural")
    prev = _os.environ.get("DA_DETECT_DATA_DIR")
    _os.environ["DA_DETECT_DATA_DIR"] = root

    def restore():
        if prev is None:
            _os.environ.pop("DA_DETECT_DATA_DIR", None)
        else:
            _os.environ["DA_DETECT_DATA_DIR"] = prev

    cfg = _flagship_cfg(**cfg_kwargs)
    cfg.TPU.MAX_GT_BOXES = max_gt
    cfg.SOLVER.IMS_PER_BATCH = 2 * k
    cfg.INPUT.MIN_SIZE_TRAIN = (resize[0],)
    cfg.INPUT.MAX_SIZE_TRAIN = resize[1]
    cfg.INPUT.MIN_SIZE_TEST = resize[0]
    cfg.INPUT.MAX_SIZE_TEST = resize[1]
    cfg.DATASETS.SOURCE_TRAIN = ("sanity_clean_cocostyle",)
    cfg.DATASETS.TARGET_TRAIN = ("sanity_foggy_cocostyle",)
    cfg.DATASETS.TARGET_TRAIN_negative = ("sanity_rainy_cocostyle",)
    cfg.DATASETS.TEST = ("sanity_foggy_cocostyle",)
    return cfg, restore


def _pipeline_rates(cfg_kwargs, k=1, steps_cold=100, steps_warm=200,
                    n_images=24, disk_hw=(1024, 2048), resize=(600, 1200),
                    max_gt=64):
    """SYSTEM train throughput, cold AND warm: the real host pipeline
    feeding the jitted step.

    cold — staging cache OFF: every step decodes its 3 PNGs and preps them
    (the reference's every-epoch behavior, engine/trainer.py:199 data_time
    there). warm — staging cache ON and pre-staged (tools/stage_dataset.py):
    steps read prepped canvases from the page cache; no decode on the
    critical path. Both return (img/s, per-step host-ms itemization)."""
    import jax
    import jax.random as jrandom
    from da_detect_tpu.data import make_data_loader_da, prestage_datasets
    from da_detect_tpu.engine.trainer import create_train_state, make_train_step
    from da_detect_tpu.models import build_detection_model

    cfg, restore = _bench_data_cfg(cfg_kwargs, k, n_images, disk_hw, resize,
                                   max_gt)
    out = {}
    try:
        model = build_detection_model(cfg)
        for phase, stage_on, steps in (("cold", False, steps_cold),
                                       ("warm", True, steps_warm)):
            cfg.DATALOADER.STAGE_CACHE = stage_on
            if stage_on:
                cfg.DATALOADER.STAGE_DIR = tempfile.mkdtemp(
                    prefix="dd_bench_stage_")
                t0 = time.perf_counter()
                n_staged = prestage_datasets(cfg)
                _mark(f"pre-staged {n_staged} canvases in "
                      f"{time.perf_counter() - t0:.1f}s")
            # the production host-feed transport: packed single-transfer
            # batches (TPU.PACKED_TRANSPORT; data/packing.py) — one
            # device_put per step from the prefetch thread
            loader = make_data_loader_da(cfg, aligned=True, seed=0,
                                         packed=True)
            it = iter(loader)
            buf, packer = next(it)
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
            final = float(m["loss_total"])  # barrier inside timed region
            dt = (time.perf_counter() - t0) / steps
            assert np.isfinite(final)
            stats = loader.stats
            loader.close()
            del state, step
            out[phase] = (3 * k / dt, _host_ms(stats))
            _mark(f"pipeline {phase}: {3 * k / dt:.2f} img/s "
                  f"host={out[phase][1]}")
    finally:
        restore()
    return out


def _inference_pipeline_rates(cfg_kwargs, n_images=24,
                              disk_hw=(1024, 2048), resize=(600, 1200)):
    """SYSTEM eval throughput, cold AND warm: the real eval loader (decode,
    prep, fixed-shape batching) -> jitted eval forward -> unpad/rescale to
    original frames (engine/inference.py compute_on_dataset — the exact
    span the reference times at inference.py:104-110 there). Returns
    {phase: (img/s, host-ms itemization)}."""
    import jax
    from da_detect_tpu.data import make_data_loader, prestage_datasets
    from da_detect_tpu.engine.inference import compute_on_dataset
    from da_detect_tpu.models import build_detection_model

    cfg, restore = _bench_data_cfg(cfg_kwargs, 1, n_images, disk_hw, resize,
                                   max_gt=64)
    cfg.TEST.IMS_PER_BATCH = 1
    out = {}
    try:
        model = build_detection_model(cfg)
        variables = None
        for phase, stage_on in (("cold", False), ("warm", True)):
            cfg.DATALOADER.STAGE_CACHE = stage_on
            if stage_on:
                cfg.DATALOADER.STAGE_DIR = tempfile.mkdtemp(
                    prefix="dd_bench_stage_eval_")
                prestage_datasets(cfg, is_train=False)
            # pass 1: compile the eval step (+ fills nothing: loaders are
            # single-pass); pass 2 is the timed run. Packed transport —
            # the production single-device eval path (train_core.run_eval)
            for timed in (False, True):
                if variables is None:
                    init_loader, _ = make_data_loader(cfg, is_train=False)
                    batch, _ids = next(iter(init_loader))
                    variables = model.init({"params": jax.random.PRNGKey(0)},
                                           batch)
                    init_loader.close()
                loader, _ = make_data_loader(cfg, is_train=False,
                                             packed=True)
                t0 = time.perf_counter()
                preds = compute_on_dataset(model, variables, loader,
                                           progress_every=0)
                dt = time.perf_counter() - t0
                stats = loader.stats
                loader.close()
                if timed:
                    assert len(preds) == n_images
                    out[phase] = (n_images / dt, _host_ms(stats))
                    _mark(f"inference pipeline {phase}: "
                          f"{n_images / dt:.2f} img/s host={out[phase][1]}")
    finally:
        restore()
    return out


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
        "host_to_device_MBps": None,
        "pipeline_images_per_sec": None,
        "pipeline_warm_images_per_sec": None,
        "pipeline_cold_host_ms": None,
        "pipeline_warm_host_ms": None,
        "inference_images_per_sec": None,
        "inference_mfu": None,
        "inference_pipeline_images_per_sec": None,
        "inference_pipeline_warm_images_per_sec": None,
        "unaligned_images_per_sec": None,
        "aligned_noshare_images_per_sec": None,
        "aligned_k8_images_per_sec": None,
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

    # host->device wire bandwidth: the loader-fed pipeline's hard bound on
    # relayed attachments (PERFORMANCE.md §Host input pipeline)
    try:
        _mark("wire probe")
        out["host_to_device_MBps"] = round(_wire_mbps(), 1)
        _mark(f"wire: {out['host_to_device_MBps']} MB/s")
    except Exception:
        pass

    # the SYSTEM numbers: loader-fed sustained throughput, cold (every
    # step decodes its PNGs) and warm (pre-staged canvas cache). Same
    # device program as the headline; the gap is host-pipeline overhead,
    # itemized per stage in *_host_ms.
    # need_s: packed-variant step compile (cold) + data gen + prestage +
    # 100 cold + 200 warm steps.
    try:
        if budget_left(420):
            _mark("pipeline (loader-fed) section")
            rates = _pipeline_rates(cfg_kwargs, k=1)
            out["pipeline_images_per_sec"] = round(rates["cold"][0], 3)
            out["pipeline_cold_host_ms"] = rates["cold"][1]
            out["pipeline_warm_images_per_sec"] = round(rates["warm"][0], 3)
            out["pipeline_warm_host_ms"] = rates["warm"][1]
    except Exception:
        pass

    # inference path (cheap compile): device-resident images/s + MFU
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

    # loader-fed eval: real decode -> eval forward -> unpad/rescale
    try:
        if budget_left(300):
            _mark("inference pipeline (loader-fed) section")
            rates = _inference_pipeline_rates(cfg_kwargs)
            out["inference_pipeline_images_per_sec"] = round(
                rates["cold"][0], 3)
            out["inference_pipeline_warm_images_per_sec"] = round(
                rates["warm"][0], 3)
    except Exception:
        pass

    # scaling rows (budgeted: each is an extra full-step compile; cold
    # compiles over the relay run ~3-5 min, so each row must leave room)
    for key, kwargs, n_img, iters in (
            ("aligned_k8_images_per_sec", dict(k=8, aligned=True), 24, 8),
            ("aligned_noshare_images_per_sec",
             dict(k=1, aligned=True, share_pool=False), 3, 20),
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
