"""Device-level profile of the flagship DA-triplet train step.

Captures a jax.profiler trace of a few steady-state steps on the attached
TPU and prints the top HLO ops by total device time — the ground-truth
attribution that step-level ablations can only approximate.

Run ON the TPU: python scripts/profile_step.py [--steps N]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import shutil
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = "/tmp/da_detect_profile"


def build_step():
    import __graft_entry__ as g
    from da_detect_tpu.engine.trainer import create_train_state, make_train_step
    from da_detect_tpu.models import build_detection_model

    cfg = g._flagship_cfg(canvas=(608, 1216), train_tops=(12000, 2000),
                          test_tops=(6000, 1000))
    cfg.TPU.MAX_GT_BOXES = 64
    cfg.SOLVER.IMS_PER_BATCH = 2
    model = build_detection_model(cfg)
    sample = []
    for d, src in ((0, True), (1, False), (2, False)):
        b, t = g._batch(cfg, 1, seed=d, is_source=src)
        sample += [b, t]
    sample = tuple(sample)
    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0), sample,
                                   "cosine")
    step = make_train_step(model, tx, aligned=False)
    return step, state, sample


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    print("devices:", jax.devices())
    step, state, sample = build_step()
    state, metrics = step(state, *sample)
    float(metrics["loss_total"])
    for _ in range(3):
        state, metrics = step(state, *sample)
    float(metrics["loss_total"])

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(args.steps):
            state, metrics = step(state, *sample)
        float(metrics["loss_total"])

    p = glob.glob(TRACE_DIR + "/**/*.trace.json.gz", recursive=True)[0]
    with gzip.open(p) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tids = {(e["pid"], e["tid"]): e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    tpu_pids = [pid for pid, n in pids.items() if "TPU" in n]
    # only the "XLA Ops" lane holds leaf HLO ops; the "Steps"/"XLA Modules"
    # lanes carry whole-step spans that would double-count the totals
    leaf = [e for e in ev if e.get("ph") == "X" and e["pid"] in tpu_pids
            and tids.get((e["pid"], e["tid"])) == "XLA Ops"]
    steps_lane = [e for e in ev if e.get("ph") == "X" and e["pid"] in tpu_pids
                  and tids.get((e["pid"], e["tid"])) == "Steps"]
    if steps_lane:
        durs = [e["dur"] / 1e3 for e in steps_lane]
        print(f"step durations (Steps lane): "
              f"{', '.join(f'{d:.2f}' for d in durs)} ms")
    total = sum(e.get("dur", 0) for e in leaf) / 1e3 / args.steps
    print(f"XLA-op device time: {total:.2f} ms/step ({len(leaf)} events)")

    agg = collections.Counter()
    for e in leaf:
        # metadata often carries the fused op label in args
        name = e["name"]
        a = e.get("args") or {}
        lbl = a.get("long_name") or a.get("tf_op") or name
        agg[lbl.split("(")[0][:80]] += e.get("dur", 0)
    for name, d in agg.most_common(40):
        ms = d / 1e3 / args.steps
        print(f"{ms:8.3f} ms  {name}")


if __name__ == "__main__":
    main()
