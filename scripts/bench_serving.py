"""Serving cold-start bench: AOT artifact load vs jit compile, on the chip.

Measures, for the flagship eval forward (R-50-C4 DA config at the given
canvas), time-from-process-start to first detection result via
(a) the AOT serving artifact (tools/export_serving), vs
(b) plain jax.jit with the persistent compile cache warm, vs
(c) plain jax.jit cold (fresh cache dir) — the reference-style serving
    path (demo/predictor compiles on first request).

Each phase runs in a fresh process (cold-start is a process property).

Run ON the TPU: python scripts/bench_serving.py [--canvas 608 1216]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys, time
t_start = time.time()
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp
from __graft_entry__ import _flagship_cfg, _batch
from da_detect_tpu.models import build_detection_model

cfg = _flagship_cfg(canvas=CANVAS, train_tops=(6000, 1000),
                    test_tops=(6000, 1000))
model = build_detection_model(cfg)
batch, _ = _batch(cfg, 1)
variables = dict(model.init({"params": jax.random.PRNGKey(0)}, batch))
t_init = time.time()

if MODE == "export":
    from da_detect_tpu.engine.serving import export_serving
    export_serving(cfg, model, variables, ARTIFACT, fmt="aot")
    print(f"RESULT export took={time.time() - t_init:.1f}s "
          f"bytes={os.path.getsize(ARTIFACT)}")
    raise SystemExit(0)

if MODE == "aot":
    from da_detect_tpu.engine.serving import load_serving
    serving = load_serving(ARTIFACT)
else:
    serving = jax.jit(lambda v, b: model.apply(v, b))
out = serving(variables, batch)
# host fetch = honest barrier (TROUBLESHOOTING.md)
float(jnp.sum(jax.tree.leaves(out)[0]))
t_first = time.time()
out = serving(variables, batch)
float(jnp.sum(jax.tree.leaves(out)[0]))
t_steady = time.time()
print(f"RESULT {MODE} init={t_init - t_start:.1f}s "
      f"first={t_first - t_init:.1f}s steady={(t_steady - t_first)*1e3:.1f}ms")
"""


def run_child(mode, canvas, artifact, extra_env=None):
    preamble = (f"REPO = {REPO!r}\nMODE = {mode!r}\n"
                f"CANVAS = {tuple(canvas)!r}\nARTIFACT = {artifact!r}\n")
    env = dict(os.environ, **(extra_env or {}))
    t0 = time.time()
    r = subprocess.run([sys.executable, "-c", preamble + _CHILD],
                       capture_output=True, text=True, env=env, cwd=REPO)
    out = [l for l in r.stdout.splitlines() if l.startswith("RESULT")]
    if out:
        print(f"{out[0]}  wall={time.time() - t0:.1f}s")
        return
    print(r.stdout[-2000:], r.stderr[-2000:])
    raise SystemExit(f"{mode} child failed rc={r.returncode}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--canvas", type=int, nargs=2, default=(608, 1216))
    args = ap.parse_args()
    canvas = tuple(args.canvas)
    art = os.path.join(tempfile.mkdtemp(), "serving.pkl")

    print(f"== export AOT artifact, canvas {canvas} ==")
    run_child("export", canvas, art)
    print("== fresh-process cold starts ==")
    run_child("aot", canvas, art)
    # jit-warm must actually be warm: populate a fresh shared cache with a
    # first (discarded) run, then measure the second against it — the ambient
    # environment's cache state is unknown and would mislabel the comparison
    warm_cache = {"JAX_COMPILATION_CACHE_DIR": tempfile.mkdtemp()}
    run_child("jit-warm(populate, discarded)", canvas, art, warm_cache)
    run_child("jit-warm", canvas, art, warm_cache)
    run_child("jit-cold", canvas, art,
              {"JAX_COMPILATION_CACHE_DIR": tempfile.mkdtemp()})


if __name__ == "__main__":
    main()
