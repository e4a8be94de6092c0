"""Step time + peak-HBM effect of TPU.REMAT_* at the parity config, and the
largest triples-per-step that fits with/without remat.

Run ON the TPU: python scripts/bench_remat.py [--max-k 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(k: int, remat: bool, iters: int = 10, canvas=(608, 1216),
            level: str = "block"):
    import jax
    import __graft_entry__ as g
    from da_detect_tpu.engine.trainer import create_train_state, make_train_step
    from da_detect_tpu.models import build_detection_model

    cfg = g._flagship_cfg(canvas=tuple(canvas), train_tops=(12000, 2000),
                          test_tops=(6000, 1000))
    cfg.TPU.MAX_GT_BOXES = 64
    cfg.SOLVER.IMS_PER_BATCH = 2 * k
    cfg.TPU.REMAT_BACKBONE = remat
    cfg.TPU.REMAT_ROI_HEAD = remat
    cfg.TPU.REMAT_LEVEL = level
    model = build_detection_model(cfg)
    sample = []
    for d, src in ((0, True), (1, False), (2, False)):
        b, t = g._batch(cfg, k, seed=d, is_source=src)
        sample += [b, t]
    sample = tuple(sample)
    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0), sample,
                                   "cosine")
    step = make_train_step(model, tx, aligned=False)
    state, m = step(state, *sample)
    float(m["loss_total"])
    for _ in range(2):
        state, m = step(state, *sample)
    float(m["loss_total"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, *sample)
    float(m["loss_total"])
    dt = (time.perf_counter() - t0) / iters
    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use")
    return dt, peak


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-k", type=int, default=1)
    ap.add_argument("--max-k", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--canvas", nargs=2, type=int, default=(608, 1216),
                    metavar=("H", "W"))
    ap.add_argument("--level", default="block", choices=["block", "stage"])
    ap.add_argument("--one", nargs=2, metavar=("K", "REMAT"), default=None,
                    help="internal: run a single (k, remat) measurement")
    args = ap.parse_args()

    from da_detect_tpu.utils.env import setup_environment
    setup_environment()

    if args.one:
        k, remat = int(args.one[0]), args.one[1] == "True"
        dt, peak = run_one(k, remat, args.iters, args.canvas, args.level)
        peak_s = f", peak {peak / 2**30:.2f} GiB" if peak else ""
        print(f"remat={remat} k={k}: {dt * 1e3:.1f} ms/step, "
              f"{3 * k / dt:.1f} img/s{peak_s}", flush=True)
        return

    # one subprocess per point: device peak-memory counters never reset
    # within a process, so sharing one would pollute later measurements
    import subprocess
    for remat in (False, True):
        k = args.min_k
        while k <= args.max_k:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", str(k),
                 str(remat), "--iters", str(args.iters),
                 "--canvas", str(args.canvas[0]), str(args.canvas[1]),
                 "--level", args.level],
                capture_output=True, text=True)
            out = (r.stdout or "").strip()
            if r.returncode or not out:
                msg = (r.stderr or "").strip().splitlines()
                print(f"remat={remat} k={k}: FAILED "
                      f"({msg[-1][:100] if msg else 'no output'})", flush=True)
                break
            print(out.splitlines()[-1], flush=True)
            k *= 2


if __name__ == "__main__":
    main()
