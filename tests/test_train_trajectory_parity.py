"""Multi-step training-TRAJECTORY parity vs the reference's composed model
AND training loop.

test_train_loss_parity proves one forward's loss dict matches and
test_solver proves each optimizer/schedule piece matches; this file proves
the COMPOSITION OVER TIME: N full optimizer steps of the reference loop —
SGD momentum with the per-param bias lr/wd rules
(/root/reference/maskrcnn_benchmark/solver/build.py:14-16), the warmup
schedule stepping (engine/trainer.py:92 pre-step for WarmupMultiStepLR,
trainer.py:242 post-step timm step_update for the triplet/cosine path),
loss summing (trainer.py:230), and the cross-step adaptive-margin state
(da_heads/loss.py:180-228) — produce the same per-step loss dicts AND the
same final parameters as our ONE JITTED STEP iterated N times.

Reference-side backward: the reference only ships a CUDA ROIAlign backward
(csrc/cuda/ROIAlign_cuda.cu:178); its CPU csrc is forward-only. We therefore
swap the reference's `roi_align` for a pure-torch re-implementation of its
own CPU forward kernel (csrc/cpu/ROIAlign_cpu.cpp:17-215, same pre_calc
bilinear + adaptive grid + malformed-roi clamp) and let torch autograd
derive the backward — the handwritten CUDA backward IS the adjoint of that
forward, so the gradients are the reference's own semantics. The stand-in's
forward is asserted against the reference's compiled `_C.roi_align_forward`
on every call, so the anchor cannot drift.

Determinism: same all-sampled budgets + eval-mode DAInsHead dropout as
test_train_loss_parity; additionally the positive-domain image is a COPY of
the source image in the triplet run (the aligned-data contract). The
adaptive-margin DAState (da_heads/loss.py:180-228) is threaded across all
steps and compared on both sides; the growth trigger itself cannot fire in
this composed setup (see _TRIPLET_TRAJ) and is pinned separately in
tests/test_da_margin.py.

Source-only note: the reference has no runnable source-only train loop to
anchor N steps against (generalized_rcnn.py leaves detector_losses unbound
without DA heads; train_net.py's do_da_train call has a stale signature) —
its source-supervision losses and their gradients are certified inside the
2-domain trajectory below (same evaluators, same masks).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ref_model_harness import (REF, calibrate_reference_heads,  # noqa: E402
                               randomize_reference_weights,
                               reference_model_stack)
from test_pipeline_parity import structured_image  # noqa: E402
from test_train_loss_parity import (_DA_WEIGHTS, _TRAIN_COMMON,  # noqa: E402
                                    _TRIPLET_WEIGHTS, DA_YAML, TRIPLET_YAML,
                                    _gt_boxes, _paths)

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not os.path.isdir(REF),
                                 reason="reference tree not available")]

H, W = 128, 160
MAX_GT = 8
N_STEPS = 4

# visible updates + schedule features all exercised inside N_STEPS=4:
# linear warmup (3 its), then for multistep the GAMMA decay at step 3.
# BASE_LR is kept small ON PURPOSE: the calibrated random heads make the
# losses violently sensitive to the parameters (one lr=1e-4 update moves
# loss_box_reg several x), so larger lrs amplify benign fp gradient noise
# (measured 0.08% global, see _assert docstring) into >10% loss mismatches
# by step 2 — chaos, not semantics.
_SOLVER = [
    "SOLVER.BASE_LR", "0.0001",
    "SOLVER.MOMENTUM", "0.9",
    "SOLVER.WEIGHT_DECAY", "0.0005",
    # "0" not "0.0": the reference defaults type this key as int
    "SOLVER.WEIGHT_DECAY_BIAS", "0",
    "SOLVER.BIAS_LR_FACTOR", "2",
    "SOLVER.WARMUP_ITERS", "3",
    "SOLVER.WARMUP_FACTOR", str(1.0 / 3),
    "SOLVER.WARMUP_METHOD", "linear",
    "SOLVER.STEPS", "(3,)",
    "SOLVER.GAMMA", "0.1",
    "SOLVER.MAX_ITER", "8",
    "SOLVER.WARMUP_LR", "1e-5",
    "SOLVER.LR_MIN", "1e-6",
]

# Margin-state fixture. The growth trigger (`loss == 0.0 and int(margin)
# != int(max_margin)`, loss.py:188) cannot fire in this composed setup:
# torch>=2 rejects TripletMarginLoss(margin<=0), and with any positive
# margin the exact-0.0 loss would need d(anchor,negative) > margin at
# EVERY reduced element — but the randomized 0.05-std trunk attenuates the
# input signal so hard that C4 features are input-independent to ~1e-5
# (measured), so distances never approach the 1.0 margin. The trajectory
# therefore anchors the NO-GROWTH path (the gate evaluating false every
# step while the last-loss state threads through); the growth arithmetic
# itself is pinned deterministically in tests/test_da_margin.py. MAX
# margin is raised so the gate's int(margin) != int(max_margin) side is
# genuinely true — the loss != 0.0 side is what holds growth off.
_TRIPLET_TRAJ = _TRIPLET_WEIGHTS + [
    "MODEL.DA_HEADS.TRIPLET_MAX_MARGIN", "3.0",
]


# --------------------------------------------------------------------------
# differentiable stand-in for the reference ROIAlign forward kernel
# --------------------------------------------------------------------------

def _torch_roi_align(inp, rois, output_size, spatial_scale, sampling_ratio):
    """Pure-torch ROIAlign == csrc/cpu/ROIAlign_cpu.cpp (the original
    non-aligned Caffe2 variant: no -0.5 offset, malformed rois forced 1x1,
    adaptive ceil grid, per-sample out-of-bounds zeroing, low>=dim-1 clamp).
    Differentiable in ``inp``; rois are detached (the reference backward
    returns no roi gradient, roi_align.py:44)."""
    ph, pw = output_size
    C, height, width = inp.shape[1:]
    rois = rois.detach()
    outs = []
    for n in range(rois.shape[0]):
        b = int(rois[n, 0])
        x1, y1, x2, y2 = (rois[n, 1:].double() * spatial_scale).tolist()
        roi_w = max(x2 - x1, 1.0)
        roi_h = max(y2 - y1, 1.0)
        bin_h, bin_w = roi_h / ph, roi_w / pw
        gh = sampling_ratio if sampling_ratio > 0 else int(math.ceil(roi_h / ph))
        gw = sampling_ratio if sampling_ratio > 0 else int(math.ceil(roi_w / pw))

        def axis(start, bins, bsz, g, dim):
            # sample coords (bins, g), then the kernel's bilinear prep
            t = (torch.arange(bins, dtype=torch.float64).view(-1, 1) * bsz
                 + (torch.arange(g, dtype=torch.float64).view(1, -1) + 0.5)
                 * bsz / g + start).reshape(-1)
            valid = (t >= -1.0) & (t <= dim)
            tc = t.clamp(min=0.0)
            low = tc.long()  # trunc == floor for tc >= 0
            cap = low >= dim - 1
            low = torch.where(cap, torch.full_like(low, dim - 1), low)
            high = torch.where(cap, low, low + 1)
            tv = torch.where(cap, low.double(), tc)
            lfrac = (tv - low.double()).float()
            return valid, low, high, lfrac

        vy, y_lo, y_hi, ly = axis(y1, ph, bin_h, gh, height)
        vx, x_lo, x_hi, lx = axis(x1, pw, bin_w, gw, width)
        hy, hx = 1.0 - ly, 1.0 - lx
        flat = inp[b].reshape(C, height * width)

        def gather(yi, xi):
            return flat[:, (yi * width).view(-1, 1) + xi.view(1, -1)]

        val = (hy.view(-1, 1) * hx.view(1, -1) * gather(y_lo, x_lo)
               + hy.view(-1, 1) * lx.view(1, -1) * gather(y_lo, x_hi)
               + ly.view(-1, 1) * hx.view(1, -1) * gather(y_hi, x_lo)
               + ly.view(-1, 1) * lx.view(1, -1) * gather(y_hi, x_hi))
        val = val * (vy.view(-1, 1) & vx.view(1, -1)).float()
        outs.append(val.reshape(C, ph, gh, pw, gw).sum((2, 4)) / (gh * gw))
    return torch.stack(outs)


def _patch_differentiable_roi_align():
    """Swap maskrcnn_benchmark.layers.roi_align.roi_align for the pure-torch
    stand-in, asserting forward parity with the compiled `_C` kernel on
    every call. Must run inside reference_model_stack()."""
    import importlib
    import maskrcnn_benchmark._C as _C
    # layers/__init__.py re-exports the roi_align FUNCTION over the
    # submodule name, so `import ... as` would bind the function
    ra_mod = importlib.import_module("maskrcnn_benchmark.layers.roi_align")

    def checked(inp, rois, output_size, spatial_scale, sampling_ratio):
        out = _torch_roi_align(inp, rois, output_size, spatial_scale,
                               sampling_ratio)
        ref = _C.roi_align_forward(inp.detach(), rois.detach(), spatial_scale,
                                   output_size[0], output_size[1],
                                   sampling_ratio)
        torch.testing.assert_close(out.detach(), ref, rtol=1e-4, atol=1e-5)
        return out

    ra_mod.roi_align = checked


# --------------------------------------------------------------------------
# timm CosineLRScheduler stand-in (timm is not installed here)
# --------------------------------------------------------------------------

class _TimmCosineShim:
    """The exact subset of timm.scheduler.CosineLRScheduler the reference's
    triplet trainer uses (train_net_triplet.py:66-81: t_initial, lr_min,
    warmup_lr_init, warmup_t, cycle_limit=1, t_in_epochs=False):

    * base_values = each param group's lr at construction (so the bias 2x
      group anneals from its own base),
    * construction sets every group to warmup_lr_init (warmup_t > 0),
    * step_update(t): warmup_lr_init + t*(base-warmup_lr_init)/warmup_t for
      t < warmup_t, else lr_min + 0.5*(base-lr_min)*(1+cos(pi*t/t_initial))
      (warmup_prefix=False: t counts the warmup span too),
    * the value is written straight into group['lr'] (no lr_scale fields).
    """

    def __init__(self, optimizer, t_initial, lr_min, warmup_lr_init, warmup_t):
        self.opt = optimizer
        self.t_initial, self.lr_min = t_initial, lr_min
        self.w0, self.warmup_t = warmup_lr_init, warmup_t
        self.base = [g["lr"] for g in optimizer.param_groups]
        self._apply(0)

    def _lr(self, base, t):
        if t < self.warmup_t:
            return self.w0 + t * (base - self.w0) / self.warmup_t
        return self.lr_min + 0.5 * (base - self.lr_min) * (
            1.0 + math.cos(math.pi * t / self.t_initial))

    def _apply(self, t):
        for g, b in zip(self.opt.param_groups, self.base):
            g["lr"] = self._lr(b, t)

    def step_update(self, num_updates):
        self._apply(num_updates)


# --------------------------------------------------------------------------
# reference trajectory
# --------------------------------------------------------------------------

def _run_reference_trajectory(yaml_rel, overrides, imgs, schedule, seed=123):
    """N_STEPS of the reference training loop on its own composed model.
    Returns (initial_sd, per-step loss dicts, final_sd, (margin_img,
    margin_ins) or None)."""
    with reference_model_stack() as (ref_cfg, build_model, to_image_list):
        from maskrcnn_benchmark.solver.build import make_optimizer
        from maskrcnn_benchmark.solver.lr_scheduler import WarmupMultiStepLR
        from maskrcnn_benchmark.structures.bounding_box import BoxList

        _patch_differentiable_roi_align()

        cfg = ref_cfg.clone()
        cfg.merge_from_file(os.path.join(REF, "..", "configs", yaml_rel))
        cfg.MODEL.DEVICE = "cpu"
        cfg.merge_from_list(_TRAIN_COMMON + _SOLVER + overrides)
        model = build_model(cfg)
        model.eval()
        randomize_reference_weights(model, seed)
        sd0 = calibrate_reference_heads(model, torch.from_numpy(imgs[0]),
                                        to_image_list)
        # deep-copy: calibrate returns .numpy() VIEWS of the live params —
        # the in-place SGD updates below would silently turn the "initial"
        # snapshot into the final weights
        sd0 = {k: v.copy() for k, v in sd0.items()}
        model.train()
        for m in model.modules():  # determinism: DAInsHead dropout off
            if type(m).__name__ == "DAInsHead":
                m.eval()

        optimizer = make_optimizer(cfg, model)
        if schedule == "multistep":
            # do_train loop semantics (engine/trainer.py:92): scheduler
            # steps BEFORE the update, so update k runs at lr(epoch=k)
            scheduler = WarmupMultiStepLR(
                optimizer, cfg.SOLVER.STEPS, cfg.SOLVER.GAMMA,
                warmup_factor=cfg.SOLVER.WARMUP_FACTOR,
                warmup_iters=cfg.SOLVER.WARMUP_ITERS,
                warmup_method=cfg.SOLVER.WARMUP_METHOD)
        else:
            # do_da_train semantics (engine/trainer.py:242): timm
            # step_update(iteration) AFTER the update, construction lr
            # for update 1 — so update k runs at lr(t=k-1)
            scheduler = _TimmCosineShim(
                optimizer, cfg.SOLVER.MAX_ITER, cfg.SOLVER.LR_MIN,
                cfg.SOLVER.WARMUP_LR, cfg.SOLVER.WARMUP_ITERS)

        gt = torch.from_numpy(_gt_boxes())
        targets = []
        for i in range(len(imgs)):
            t = BoxList(gt.clone(), (W, H), mode="xyxy")
            t.add_field("labels", torch.tensor([1, 2, 3, 4]))
            t.add_field("is_source",
                        torch.full((len(gt),), i == 0, dtype=torch.bool))
            targets.append(t)
        il = to_image_list([torch.from_numpy(im) for im in imgs], 32)

        step_losses = []
        for iteration in range(1, N_STEPS + 1):
            if schedule == "multistep":
                scheduler.step()
            loss_dict = model(il, targets)
            losses = sum(loss for loss in loss_dict.values())
            optimizer.zero_grad()
            losses.backward()
            optimizer.step()
            if schedule != "multistep":
                scheduler.step_update(iteration)
            step_losses.append({k: float(v) for k, v in loss_dict.items()})

        margins = None
        for m in model.modules():
            if type(m).__name__ == "DomainAdaptationModule_triplet":
                ev = m.loss_evaluator
                margins = (float(ev.margin_img), float(ev.margin_ins))
        final_sd = {k: v.detach().numpy().copy()
                    for k, v in model.state_dict().items()}
        return sd0, step_losses, final_sd, margins


# --------------------------------------------------------------------------
# our trajectory: the production jitted step, iterated
# --------------------------------------------------------------------------

def _run_ours_trajectory(yaml_rel, overrides, sd, imgs, mode, schedule):
    from da_detect_tpu.config import get_cfg
    from da_detect_tpu.engine.trainer import TrainState, make_train_step
    from da_detect_tpu.models import build_detection_model
    from da_detect_tpu.models.da import DAState
    from da_detect_tpu.solver.optim import detectron_sgd, param_labels
    from da_detect_tpu.solver.schedules import make_lr_scheduler
    from da_detect_tpu.structures.image_batch import ImageBatch, Targets
    from da_detect_tpu.utils.c2_loading import merge_into, torch_to_flax

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REF, "..", "configs", yaml_rel))
    cfg.merge_from_list(_TRAIN_COMMON + _SOLVER + overrides)
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.APPROX_TOPK = False
    cfg.TPU.MAX_GT_BOXES = MAX_GT
    # parity pins the reference's independent-draw re-pool
    # (generalized_rcnn.py:109-114 there); the shared-pool production
    # default is equivalence-gated separately (test_model_build.py:122)
    cfg.TPU.SHARE_POSITIVE_POOL = False
    model = build_detection_model(cfg)

    gt = _gt_boxes()
    gtb = np.zeros((1, MAX_GT, 4), np.float32)
    gtb[0, :len(gt)] = gt
    gtl = np.zeros((1, MAX_GT), np.int32)
    gtl[0, :len(gt)] = [1, 2, 3, 4]
    gtv = np.zeros((1, MAX_GT), bool)
    gtv[0, :len(gt)] = True

    def batch(i, src):
        return ImageBatch(
            images=jnp.asarray(imgs[i].transpose(1, 2, 0)[None]),
            sizes=jnp.asarray([[H, W]], jnp.int32),
            orig_sizes=jnp.asarray([[H, W]], jnp.int32),
            is_source=jnp.full((1,), src))

    def targets():
        return Targets(boxes=jnp.asarray(gtb), labels=jnp.asarray(gtl),
                       valid=jnp.asarray(gtv))

    args = [batch(0, True), targets()]
    if mode in ("da", "triplet"):
        args += [batch(1, False), targets()]
    if mode == "triplet":
        args += [batch(2, False), targets()]
    args = tuple(args)

    da_state = DAState.create(cfg.MODEL.DA_HEADS.TRIPLET_MARGIN_IMG,
                              cfg.MODEL.DA_HEADS.TRIPLET_MARGIN_INS)
    rngs = {"params": jax.random.PRNGKey(0),
            "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = dict(model.init(rngs, args[0], args[1], da_state, *args[2:],
                                aligned=(mode == "triplet"),
                                method=model.train_forward))
    params_src, frozen_src, unmatched = torch_to_flax(sd)
    assert all("cell_anchors" in k for k in unmatched), unmatched
    v = jax.tree.map(np.asarray, variables)
    applied = merge_into(v["params"], params_src)
    n_conv = len(jax.tree_util.tree_leaves(params_src))
    assert len(applied) == n_conv, (
        sorted(set(_paths(params_src)) - set(applied)))
    assert merge_into(v["frozen"], frozen_src)

    s = cfg.SOLVER
    labels = param_labels(v["params"], cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT)
    sched = make_lr_scheduler(cfg, schedule)
    sched_b = make_lr_scheduler(cfg, schedule, base_scale=s.BIAS_LR_FACTOR)
    if schedule == "multistep":
        # reference do_train steps the scheduler before the k-th update ->
        # lr(k); our step counter is 0-based -> shift by one
        base, base_b = sched, sched_b
        sched = lambda t: base(t + 1)  # noqa: E731
        sched_b = lambda t: base_b(t + 1)  # noqa: E731
    tx = detectron_sgd(sched, s.MOMENTUM, s.WEIGHT_DECAY, s.WEIGHT_DECAY_BIAS,
                       s.BIAS_LR_FACTOR, labels, bias_lr_schedule=sched_b)

    state = TrainState(step=jnp.zeros([], jnp.int32), params=v["params"],
                       frozen=v["frozen"], opt_state=tx.init(v["params"]),
                       da_state=da_state, rng=jax.random.PRNGKey(42))
    step = make_train_step(model, tx, aligned=(mode == "triplet"),
                           donate=False, deterministic=True)
    step_losses = []
    for _ in range(N_STEPS):
        state, metrics = step(state, *args)
        metrics = jax.device_get(metrics)
        step_losses.append({k: float(val) for k, val in metrics.items()
                            if k != "loss_total"})
    final_params = jax.device_get(state.params)
    margins = (float(state.da_state.margin_img),
               float(state.da_state.margin_ins))
    return v["params"], step_losses, final_params, margins


# --------------------------------------------------------------------------
# comparison helpers
# --------------------------------------------------------------------------

def _leaf_items(tree, pre=()):
    for k, v in sorted(tree.items()):
        if isinstance(v, dict):
            yield from _leaf_items(v, pre + (k,))
        else:
            yield "/".join(pre + (k,)), np.asarray(v)


# Tolerance calibration (measured, momentum=0/wd=0/lr=1e-5 single-step
# gradient compare, /tmp-style probe recorded in the commit message): the
# GLOBAL relative gradient error between torch and XLA on this composed
# model is 8e-4; individual deep-trunk leaves with near-cancelling GRL +
# detection gradients reach ~6% relative on |grad| norms 1000x below the
# head gradients (catastrophic cancellation amplifies reduction-order fp
# noise; no leaf shows a systematic bias). The per-step losses are
# additionally chaotic: the calibrated heads make dLoss/dtheta so large
# that the 0.08% delta noise shows up as ~1%/step loss drift.

_STEP_RTOL = (5e-3, 2e-2, 5e-2, 1e-1)


def _assert_trajectories_match(ref_steps, our_steps, init_params,
                               ref_final_sd, our_final):
    from da_detect_tpu.utils.c2_loading import torch_to_flax

    # per-step loss dicts (tolerance grows with step: chaos, see above)
    assert len(ref_steps) == len(our_steps) == N_STEPS
    for k_step, (ref, ours) in enumerate(zip(ref_steps, our_steps)):
        assert set(ref) == set(ours), (k_step, sorted(ref), sorted(ours))
        for k in sorted(ref):
            np.testing.assert_allclose(
                ours[k], ref[k], rtol=_STEP_RTOL[k_step], atol=1e-5,
                err_msg=f"step {k_step} loss {k}: ref={ref[k]} ours={ours[k]}")

    # final parameters: compare the trained DELTAS (p_final - p_init) —
    # raw params would pass trivially since 4 steps move them ~1e-5
    ref_params, _, _ = torch_to_flax(ref_final_sd)
    ref_final = {k: v for k, v in _leaf_items(ref_params)}
    init = {k: v for k, v in _leaf_items(init_params)}
    ours = {k: v for k, v in _leaf_items(our_final)}
    checked = moved = 0
    err2 = ref2 = 0.0
    for key, ref_v in ref_final.items():
        assert key in ours, key
        d_ref = ref_v.astype(np.float64) - init[key].astype(np.float64)
        d_our = ours[key].astype(np.float64) - init[key].astype(np.float64)
        nref = float(np.linalg.norm(d_ref))
        err = float(np.linalg.norm(d_our - d_ref))
        err2 += err ** 2
        ref2 += nref ** 2
        # per-leaf: generous (noise-dominated tiny-gradient leaves reach ~6%
        # per step); any SEMANTIC bug (lr/wd/momentum/masking) shifts its
        # leaves by far more than 15%
        floor = 1e-6 * max(float(np.linalg.norm(init[key])), 1.0)
        assert err <= 0.15 * nref + floor, (
            f"{key}: |d_ours - d_ref|={err:.3e} vs |d_ref|={nref:.3e}")
        checked += 1
        moved += nref > floor
    # global: the full trained delta vector must agree to 2%
    global_rel = (err2 ** 0.5) / max(ref2 ** 0.5, 1e-300)
    assert global_rel <= 0.02, f"global delta error {global_rel:.4f}"
    # the whole tree was compared (R-50-C4 DA param tree = 73 leaves:
    # 43 backbone conv kernels + rpn/fc/predictor/DA-head kernels+biases)
    assert checked > 60, checked
    assert moved > 20, moved       # and training actually moved it


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def da_trajectory():
    imgs = [structured_image(seed) for seed in range(2)]
    sd0, ref_steps, ref_final, _ = _run_reference_trajectory(
        DA_YAML, _DA_WEIGHTS, imgs, "multistep")
    init, our_steps, our_final, _ = _run_ours_trajectory(
        DA_YAML, _DA_WEIGHTS, sd0, imgs, "da", "multistep")
    return ref_steps, our_steps, init, ref_final, our_final


@pytest.fixture(scope="module")
def triplet_trajectory():
    # positive := copy of source (the aligned-triplet data contract: foggy/
    # rainy cityscapes are pixel-aligned renderings, data/build.py:32-47)
    imgs = [structured_image(0), structured_image(0).copy(),
            structured_image(2)]
    sd0, ref_steps, ref_final, ref_margins = _run_reference_trajectory(
        TRIPLET_YAML, _TRIPLET_TRAJ, imgs, "cosine")
    init, our_steps, our_final, our_margins = _run_ours_trajectory(
        TRIPLET_YAML, _TRIPLET_TRAJ, sd0, imgs, "triplet", "cosine")
    return (ref_steps, our_steps, init, ref_final, our_final,
            ref_margins, our_margins)


def test_2domain_da_training_trajectory(da_trajectory):
    """N=4 reference do_train-style steps (WarmupMultiStepLR stepping pre-
    update, SGD momentum + bias 2x-lr/no-wd groups, loss sum) == our jitted
    step iterated: every per-step loss AND every final parameter delta."""
    ref_steps, our_steps, init, ref_final, our_final = da_trajectory
    _assert_trajectories_match(ref_steps, our_steps, init, ref_final,
                               our_final)


def test_triplet_training_trajectory_and_margin_state(triplet_trajectory):
    """N=4 reference do_da_train-style steps (timm cosine step_update post-
    update) on the aligned triplet path, with the adaptive DAState margin
    evolving across steps on both sides."""
    (ref_steps, our_steps, init, ref_final, our_final,
     ref_margins, our_margins) = triplet_trajectory
    _assert_trajectories_match(ref_steps, our_steps, init, ref_final,
                               our_final)
    assert ref_margins is not None
    np.testing.assert_allclose(our_margins[0], ref_margins[0], rtol=1e-6)
    np.testing.assert_allclose(our_margins[1], ref_margins[1], rtol=1e-6)


def test_triplet_margin_no_growth_gate_held(triplet_trajectory):
    """The margin state threads across all N steps on both sides with the
    growth gate (loss.py:188, evaluated against the PREVIOUS step's loss)
    legitimately holding growth off: every step's image triplet loss is
    nonzero, so the margin must end exactly where it started — on BOTH
    sides (see _TRIPLET_TRAJ for why exact-0.0 loss is unreachable here;
    the growth arithmetic is pinned in tests/test_da_margin.py)."""
    ref_steps, _, _, _, _, ref_margins, our_margins = triplet_trajectory
    for s in ref_steps:
        assert s["triplet_loss_image"] != 0.0, ref_steps
    np.testing.assert_allclose(ref_margins[0], 1.0, rtol=1e-9)
    np.testing.assert_allclose(our_margins[0], 1.0, rtol=1e-6)
