"""Quick reproducer for the loader-fed SYSTEM numbers (PERFORMANCE.md
§Host input pipeline): wire bandwidth probe + cold/warm train pipeline +
cold/warm eval pipeline, with the per-stage host-budget itemization.

    python scripts/bench_host_pipeline.py [--steps 60]

Runs on the attached chip (~6-10 min warm-cache); a subset of what
bench.py measures, for fast independent verification.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60,
                    help="timed steps per pipeline phase")
    args = ap.parse_args()

    import bench

    out = {"host_to_device_MBps": round(bench._wire_mbps(), 1)}
    # the relay wire fluctuates >10x between windows; surface the probe
    # immediately so a slow run is attributable before the phases finish
    print(f"[host-pipeline] wire: {out['host_to_device_MBps']} MB/s",
          file=sys.stderr, flush=True)
    kw = dict(canvas=(608, 1216), train_tops=(12000, 2000),
              test_tops=(6000, 1000))
    rates = bench._pipeline_rates(kw, k=1, steps_cold=max(args.steps // 2, 10),
                                  steps_warm=args.steps)
    out["pipeline_images_per_sec"] = round(rates["cold"][0], 2)
    out["pipeline_cold_host_ms"] = rates["cold"][1]
    out["pipeline_warm_images_per_sec"] = round(rates["warm"][0], 2)
    out["pipeline_warm_host_ms"] = rates["warm"][1]
    ri = bench._inference_pipeline_rates(kw)
    out["inference_pipeline_images_per_sec"] = round(ri["cold"][0], 2)
    out["inference_pipeline_warm_images_per_sec"] = round(ri["warm"][0], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
