"""Per-k roofline decomposition of the aligned triplet step (VERDICT r3 #3).

The aligned (reference-exact WACV) config re-pools the positive slice's
proposals from all three domains' features every step
(generalized_rcnn.py:104-114 in the reference); its k-scaling is much
flatter than the unaligned variant's. This script PROVES where the time
goes, by variant differencing on the real chip:

  A = aligned step            (3 re-pool passes)
  C = A + SHARE_POSITIVE_POOL (2 re-pool passes: the positive pass reuses
                               the detection pass's pooled features —
                               loss-equivalence pinned by
                               tests/test_model_build.py:122)
  B = unaligned step          (0 re-pool passes, no triplet losses)

so  (A - C) = one re-pool pass,  (A - B) = the whole aligned surcharge.

For each k it prints measured time, XLA cost_analysis FLOPs and bytes, the
compute/memory roofline bound t_bound = max(flops/peak_flops,
bytes/peak_bw), and the roofline attainment t_bound/t_measured; plus the
differenced re-pool shares. Output feeds PERFORMANCE.md's aligned
k-scaling section.

Run on the TPU (default env):  python scripts/bench_roofline_aligned.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from bench import _build, _measure_step, _measured_peak_tflops  # noqa: E402


def _cost(jitted_step, args):
    compiled = jitted_step.lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def _measured_hbm_gbps():
    """Streaming-bandwidth probe. Measured by SLOPE between two rep counts
    so the relay's fixed per-dispatch round-trip (~ms, larger than the
    kernel itself at these sizes) cancels out; a naive reps=8 probe on the
    tunneled chip reports ~100 GB/s for this reason."""
    import jax
    import jax.numpy as jnp
    n = 128 * 1024 * 1024  # 512 MB f32: 1 GB read+write per rep
    x = jnp.zeros((n,), jnp.float32)

    f = jax.jit(lambda x: x * 1.000001 + 0.5)
    jax.block_until_ready(f(x))

    def run(reps):
        y = x
        t0 = time.perf_counter()
        for _ in range(reps):
            y = f(y)
        jax.block_until_ready(y)
        return time.perf_counter() - t0

    run(4)  # steady-state
    t_lo, t_hi = run(8), run(72)
    return 2 * 4 * n * (72 - 8) / (t_hi - t_lo) / 1e9  # read + write


def main():
    from da_detect_tpu.utils.env import setup_environment
    setup_environment()

    cfg_kwargs = dict(canvas=(608, 1216),
                      train_tops=(12000, 2000), test_tops=(6000, 1000))
    peak_tf = _measured_peak_tflops()
    hbm_gbps = _measured_hbm_gbps()
    print(f"# peak {peak_tf:.1f} TF/s bf16 (measured), "
          f"HBM {hbm_gbps:.0f} GB/s (measured triad)")

    rows = []
    for k in (1, 8):
        per = {}
        for name, kwargs, iters in (
                ("aligned", dict(aligned=True), 12),
                ("share_pool", dict(aligned=True, share_pool=True), 12),
                ("unaligned", dict(aligned=False), 12)):
            st, step, smp = _build(cfg_kwargs, k=k, **kwargs)
            flops, nbytes = _cost(step, (st,) + smp)
            dt = _measure_step(step, st, smp, iters=iters, warmup=2)
            t_flops = flops / (peak_tf * 1e12)
            t_bytes = nbytes / (hbm_gbps * 1e9)
            bound = max(t_flops, t_bytes)
            per[name] = dict(dt=dt, flops=flops, bytes=nbytes,
                             t_flops=t_flops, t_bytes=t_bytes,
                             attain=bound / dt,
                             img_s=3 * k / dt)
            print(f"k={k} {name:10s} {dt * 1e3:8.2f} ms  "
                  f"{3 * k / dt:7.2f} img/s  flops={flops:.3e}  "
                  f"bytes={nbytes:.3e}  bound={bound * 1e3:.2f} ms "
                  f"({'MXU' if t_flops > t_bytes else 'HBM'})  "
                  f"attainment={bound / dt:.2f}")
        a, c, b = per["aligned"], per["share_pool"], per["unaligned"]
        one_pass_ms = (a["dt"] - c["dt"]) * 1e3
        surcharge_ms = (a["dt"] - b["dt"]) * 1e3
        print(f"k={k} differenced: one re-pool pass = {one_pass_ms:.2f} ms, "
              f"full aligned surcharge = {surcharge_ms:.2f} ms "
              f"({100 * surcharge_ms / (a['dt'] * 1e3):.0f}% of aligned step)")
        rows.append(dict(k=k, **{n: dict(dt_ms=p["dt"] * 1e3,
                                         img_s=round(p["img_s"], 2),
                                         flops=p["flops"], bytes=p["bytes"],
                                         attainment=round(p["attain"], 3))
                                 for n, p in per.items()},
                         one_pass_ms=round(one_pass_ms, 2),
                         surcharge_ms=round(surcharge_ms, 2)))
    print(json.dumps(dict(peak_tflops=round(peak_tf, 1),
                          hbm_gbps=round(hbm_gbps, 0), rows=rows)))


if __name__ == "__main__":
    main()
