"""Device profile of any config's source-only TRAIN step.

Run ON the TPU: python scripts/profile_train.py --config <yaml> [--canvas H W]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = "/tmp/da_detect_profile_train"


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/e2e_faster_rcnn_X_101_32x8d_FPN_1x.yaml")
    ap.add_argument("--canvas", nargs=2, type=int, default=(800, 1344))
    args = ap.parse_args()

    import jax
    from da_detect_tpu.utils.env import setup_environment
    setup_environment()
    import __graft_entry__ as g
    from da_detect_tpu.config import get_cfg
    from da_detect_tpu.models import build_detection_model

    from da_detect_tpu.engine.trainer import create_train_state, make_train_step

    cfg = get_cfg()
    cfg.merge_from_file(args.config)
    cfg.TPU.IMAGE_SHAPE = tuple(args.canvas)
    cfg.TPU.MAX_GT_BOXES = 64
    cfg.SOLVER.IMS_PER_BATCH = 2
    model = build_detection_model(cfg)
    batch, targets = g._batch(cfg, 2)
    if cfg.MODEL.MASK_ON:
        import numpy as np
        import jax.numpy as jnp
        m = cfg.MODEL.ROI_MASK_HEAD.RESOLUTION * 2
        gshape = targets.boxes.shape[:-1]
        targets = targets.replace(masks=jnp.asarray(
            (np.random.RandomState(0).rand(*gshape, m, m) > 0.5)
            .astype(np.float32)))
    sample = (batch, targets)
    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0), sample,
                                   "multistep")
    fwd = make_train_step(model, tx)
    state, met = fwd(state, *sample)
    float(met["loss_total"])
    for _ in range(3):
        state, met = fwd(state, *sample)
    float(met["loss_total"])

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    steps = 3
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(steps):
            state, met = fwd(state, *sample)
        float(met["loss_total"])

    p = glob.glob(TRACE_DIR + "/**/*.trace.json.gz", recursive=True)[0]
    with gzip.open(p) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tids = {(e["pid"], e["tid"]): e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    tpu_pids = [pid for pid, n in pids.items() if "TPU" in n]
    leaf = [e for e in ev if e.get("ph") == "X" and e["pid"] in tpu_pids
            and tids.get((e["pid"], e["tid"])) == "XLA Ops"]
    total = sum(e.get("dur", 0) for e in leaf) / 1e3 / steps
    print(f"XLA-op device time: {total:.2f} ms/step ({len(leaf)} events)")
    agg = collections.Counter()
    for e in leaf:
        a = e.get("args") or {}
        lbl = a.get("long_name") or a.get("tf_op") or e["name"]
        agg[lbl.split("(")[0][:90]] += e.get("dur", 0)
    for name, d in agg.most_common(30):
        print(f"{d / 1e3 / steps:8.3f} ms  {name}")


if __name__ == "__main__":
    main()
