import time, numpy as np, jax
from __graft_entry__ import _batch, _flagship_cfg
from da_detect_tpu.engine.trainer import create_train_state, make_train_step
from da_detect_tpu.models import build_detection_model
cfg = _flagship_cfg(canvas=(608, 1216), train_tops=(12000, 2000), test_tops=(6000, 1000))
cfg.TPU.MAX_GT_BOXES = 64
model = build_detection_model(cfg)
sample = []
for d, src in ((0, True), (1, False), (2, False)):
    b, t = _batch(cfg, 1, seed=d, is_source=src)
    sample += [b, t]
state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0), sample, "cosine")
step = make_train_step(model, tx, aligned=False)
state, m = step(state, *sample); print("compiled, loss:", float(m["loss_total"]), flush=True)
for n in (1, 5, 20, 40):
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, *sample)
    x = float(m["loss_total"])
    print(f"n={n}: total {(time.perf_counter()-t0)*1e3:.0f} ms, per-step {(time.perf_counter()-t0)/n*1e3:.1f} ms (loss {x:.3f})", flush=True)
