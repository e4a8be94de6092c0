"""Step time of the ALIGNED triplet path (the WACV parity config trains
with DATALOADER ALIGNMENT=True; bench.py measures aligned=False).

Run ON the TPU: python scripts/bench_aligned.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    from da_detect_tpu.utils.env import setup_environment
    setup_environment()
    import __graft_entry__ as g
    from da_detect_tpu.engine.trainer import create_train_state, make_train_step
    from da_detect_tpu.models import build_detection_model

    for share in (False, True):
        cfg = g._flagship_cfg(canvas=(608, 1216), train_tops=(12000, 2000),
                              test_tops=(6000, 1000))
        cfg.TPU.MAX_GT_BOXES = 64
        cfg.SOLVER.IMS_PER_BATCH = 2
        cfg.TPU.SHARE_POSITIVE_POOL = share
        model = build_detection_model(cfg)
        sample = []
        for d, src in ((0, True), (1, False), (2, False)):
            b, t = g._batch(cfg, 1, seed=d, is_source=src)
            sample += [b, t]
        sample = tuple(sample)
        state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                       sample, "cosine")
        step = make_train_step(model, tx, aligned=True)
        state, m = step(state, *sample)
        float(m["loss_total"])
        for _ in range(3):
            state, m = step(state, *sample)
        float(m["loss_total"])
        iters = 15
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, *sample)
        float(m["loss_total"])
        dt = (time.perf_counter() - t0) / iters
        print(f"aligned triplet step (share_positive_pool={share}): "
              f"{dt * 1e3:.1f} ms, {3 / dt:.1f} img/s")
        del state, m  # release this variant's params/opt HBM before the next


if __name__ == "__main__":
    main()
