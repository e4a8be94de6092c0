import time, numpy as np, jax
from da_detect_tpu.utils.env import setup_environment
setup_environment()
from __graft_entry__ import _batch, _flagship_cfg
from da_detect_tpu.engine.trainer import create_train_state, make_train_step
from da_detect_tpu.models import build_detection_model

def measure(tag, mutate=None, da=True):
    cfg = _flagship_cfg(canvas=(608, 1216), train_tops=(12000, 2000), test_tops=(6000, 1000))
    cfg.TPU.MAX_GT_BOXES = 64
    cfg.SOLVER.IMS_PER_BATCH = 2
    if not da:
        cfg.MODEL.DOMAIN_ADAPTATION_ON = False
    if mutate:
        mutate(cfg)
    model = build_detection_model(cfg)
    sample = []
    doms = ((0, True), (1, False), (2, False)) if da else ((0, True),)
    for d, src in doms:
        b, t = _batch(cfg, 1, seed=d, is_source=src)
        sample += [b, t]
    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0), sample, "cosine")
    step = make_train_step(model, tx, aligned=False)
    state, m = step(state, *sample); float(m["loss_total"])
    for _ in range(2): state, m = step(state, *sample)
    float(m["loss_total"])
    t0 = time.perf_counter()
    for _ in range(15): state, m = step(state, *sample)
    float(m["loss_total"])
    dt = (time.perf_counter()-t0)/15
    print(f"{tag}: {dt*1e3:.1f} ms/step", flush=True)

measure("full triplet (baseline)")
measure("source-only 1img", da=False)
def no_da_heads(c): 
    for k in ("DA_IMG_LOSS_WEIGHT","DA_INS_LOSS_WEIGHT","DA_CST_LOSS_WEIGHT","DA_TRIPLET_IMG_WEIGHT","DA_TRIPLET_INS_WEIGHT"):
        c.MODEL.DA_HEADS[k] = 0.0
measure("triplet, DA losses off", no_da_heads)
measure("roi batch 128", lambda c: c.merge_from_list(["MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE","128"]))
measure("pre_nms 6000", lambda c: c.merge_from_list(["MODEL.RPN.PRE_NMS_TOP_N_TRAIN","6000"]))
