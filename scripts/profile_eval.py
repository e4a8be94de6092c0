"""Device profile of any config's eval forward.

Run ON the TPU: python scripts/profile_eval.py --config <yaml> [--canvas H W]
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

TRACE_DIR = "/tmp/da_detect_profile_eval"


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

    cfg = get_cfg()
    cfg.merge_from_file(args.config)
    cfg.TPU.IMAGE_SHAPE = tuple(args.canvas)
    model = build_detection_model(cfg)
    batch, _ = g._batch(cfg, 1)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch)
    fwd = jax.jit(lambda v, b: model.apply(v, b))
    out = fwd(variables, batch)
    float(out.scores[0, 0])
    for _ in range(3):
        out = fwd(variables, batch)
    float(out.scores[0, 0])

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    steps = 3
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(steps):
            out = fwd(variables, batch)
        float(out.scores[0, 0])

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
    print(f"XLA-op device time: {total:.2f} ms/img ({len(leaf)} events)")
    agg = collections.Counter()
    for e in leaf:
        a = e.get("args") or {}
        lbl = a.get("long_name") or a.get("tf_op") or e["name"]
        agg[lbl.split("(")[0][:90]] += e.get("dur", 0)
    for name, d in agg.most_common(30):
        print(f"{d / 1e3 / steps:8.3f} ms  {name}")


if __name__ == "__main__":
    main()
