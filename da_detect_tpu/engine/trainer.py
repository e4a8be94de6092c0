"""Training engine.

Reference engine/trainer.py:66-336 (do_train / do_da_train) re-designed as
ONE jitted SPMD step: forward (all domains) -> loss sum -> grad -> SGD update
-> new state, compiled once over the data mesh; XLA inserts the gradient
all-reduces (replacing DDP/NCCL, SURVEY §2.9). The host loop only feeds
batches, logs windowed metrics, checkpoints, and runs in-training eval —
same responsibilities, no device math.
"""

from __future__ import annotations

import logging
import time
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..models.da import DAState
from ..solver.optim import make_optimizer
from ..utils.metric_logger import MetricLogger, eta_string

log = logging.getLogger(__name__)


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    frozen: Any
    opt_state: Any
    da_state: DAState
    rng: jax.Array


def create_train_state(cfg, model, rng, sample_args: tuple,
                       schedule_kind: str = "multistep") -> tuple[TrainState, Any]:
    """Initialize params with a sample training call and build the optimizer.

    sample_args: (batch_s, targets_s[, batch_t, targets_t[, batch_n,
    targets_n]]) with tiny-but-representative shapes.
    """
    init_rngs = {"params": rng, "sampling": jax.random.fold_in(rng, 1),
                 "dropout": jax.random.fold_in(rng, 2)}
    da_state = DAState.create(cfg.MODEL.DA_HEADS.TRIPLET_MARGIN_IMG,
                              cfg.MODEL.DA_HEADS.TRIPLET_MARGIN_INS)

    # jit the init: eager init dispatches thousands of tiny ops (minutes over
    # a remote-TPU link); compiled it is one program
    @jax.jit
    def init_fn(rngs, args, da):
        return model.init(rngs, args[0], args[1], da, *args[2:],
                          method=model.train_forward)

    variables = init_fn(init_rngs, tuple(sample_args), da_state)
    params = variables["params"]
    frozen = variables.get("frozen", {})
    tx, sched = make_optimizer(cfg, params, schedule_kind)
    state = TrainState(step=jnp.zeros([], jnp.int32), params=params,
                       frozen=frozen, opt_state=tx.init(params),
                       da_state=da_state, rng=rng)
    return state, tx


def make_train_step(model, tx, *, aligned: bool = False,
                    donate: bool = True,
                    deterministic: bool = False,
                    packed: bool = False) -> Callable:
    """Returns jitted step(state, *batch_args) -> (state, metrics).

    ``deterministic`` disables dropout (eval-mode DAInsHead) — used by the
    reference-anchored trajectory parity tests; production leaves it off.

    ``packed``: the step takes (state, packed_buffer, packer) — the
    single-transfer transport produced by packed loaders (data/packing.py);
    the buffer is unpacked on device at the top of the program. ``packer``
    is a static argument, so each batch layout (e.g. the two orientation
    canvas buckets) compiles its own program instead of mis-slicing."""

    def step_fn(state: TrainState, batch_s, targets_s, batch_t=None,
                targets_t=None, batch_n=None, targets_n=None):
        step_rng = jax.random.fold_in(state.rng, state.step)
        rngs = {"sampling": jax.random.fold_in(step_rng, 0),
                "dropout": jax.random.fold_in(step_rng, 1)}
        extra = tuple(a for a in (batch_t, targets_t, batch_n, targets_n)
                      if a is not None)

        def loss_fn(params):
            losses, new_da = model.apply(
                {"params": params, "frozen": state.frozen}, batch_s, targets_s,
                state.da_state, *extra, aligned=aligned,
                deterministic=deterministic,
                method=model.train_forward, rngs=rngs)
            total = sum(jnp.asarray(v, jnp.float32) for v in losses.values())
            return total, (losses, new_da)

        (total, (losses, new_da)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        import optax
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt, da_state=new_da)
        metrics = dict(losses)
        metrics["loss_total"] = total
        return new_state, metrics

    if packed:
        def packed_step_fn(state, buf, packer):
            return step_fn(state, *packer.unpack(buf))
        return jax.jit(packed_step_fn, static_argnums=(2,),
                       donate_argnums=(0, 1) if donate else ())
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def do_train(cfg, model, state, tx, data_iter, *, max_iter: int,
             start_iter: int = 0, checkpointer=None, checkpoint_period: int = 2500,
             meters: Optional[MetricLogger] = None, aligned: bool = False,
             eval_fn: Callable | None = None, log_period: int = 20,
             profile_dir: str | None = None,
             profile_range: tuple[int, int] = (10, 20),
             test_period: int = 0, packed: bool = False):
    """Host-side loop (reference do_da_train trainer.py:150-336): batches in,
    metrics/checkpoints/eval out. ``data_iter`` yields tuples matching
    train_forward's signature (already device-sharded). ``profile_dir``
    captures a jax.profiler trace over ``profile_range`` iterations
    (the reference has only wall-clock meters — SURVEY §5.1)."""
    meters = meters or MetricLogger()
    train_step = make_train_step(model, tx, aligned=aligned, packed=packed)
    log.info("start training at iteration %d", start_iter)
    start = time.perf_counter()
    last = start
    # steps dispatch asynchronously: the host only blocks at the logged
    # iterations' device_get, which drains the whole queued window. A
    # per-logged-iteration wall clock would therefore report the drain
    # (window backlog), not the step cost — average over the window instead.
    window_start = start
    window_iters = 0
    window_data = 0.0
    for iteration in range(start_iter, max_iter):
        if profile_dir is not None and iteration == profile_range[0]:
            jax.profiler.start_trace(profile_dir)
            log.info("profiler trace started -> %s", profile_dir)
        if profile_dir is not None and iteration == profile_range[1]:
            jax.profiler.stop_trace()
            log.info("profiler trace stopped")
        batch_args = next(data_iter)
        # accumulated over the window, like batch_time: a single sampled
        # iteration's host wait is misleading for diagnosing input-bound
        # steps (prefetch hides the wait on most iterations, then one
        # iteration eats the whole stall)
        window_data += time.perf_counter() - last
        state, metrics = train_step(state, *batch_args)
        window_iters += 1
        if (iteration % log_period == 0) or iteration == max_iter - 1:
            metrics = jax.device_get(metrics)
            total = float(metrics["loss_total"])
            # NaN abort (reference trainer.py:279-281)
            if not np.isfinite(total):
                log.error("loss diverged to %s at iteration %d — aborting",
                          total, iteration)
                raise FloatingPointError(f"non-finite loss at {iteration}")
            now = time.perf_counter()
            batch_time = (now - window_start) / window_iters
            data_time = window_data / window_iters
            window_start, window_iters, window_data = now, 0, 0.0
            meters.update(time=batch_time, data=data_time,
                          **{k: float(v) for k, v in metrics.items()})
            eta = eta_string(meters.meters["time"].global_avg,
                             max_iter - iteration)
            log.info("eta: %s  iter: %d  %s", eta, iteration, str(meters))
        last = time.perf_counter()

        if checkpointer is not None and (iteration + 1) % checkpoint_period == 0:
            # never checkpoint a poisoned state: re-verify finiteness at save
            # time (the per-iteration host sync the reference pays,
            # trainer.py:279-281, would serialize the pipeline; checking on
            # log + save boundaries bounds the damage instead)
            total = float(jax.device_get(metrics["loss_total"]))
            if not np.isfinite(total):
                log.error("loss diverged to %s before checkpoint at %d",
                          total, iteration + 1)
                raise FloatingPointError(f"non-finite loss at {iteration}")
            checkpointer.save(iteration + 1, jax.device_get(state))
            if (eval_fn is not None and cfg.MODEL.EVAL_USE_IN_TRAINING
                    and not test_period):
                eval_fn(state, iteration + 1)
        # SOLVER.TEST_PERIOD decouples in-training eval from checkpoints
        # (upstream's periodically_testing config)
        if (test_period and eval_fn is not None
                and (iteration + 1) % test_period == 0):
            eval_fn(state, iteration + 1)

    if checkpointer is not None:
        checkpointer.save(max_iter, jax.device_get(state))
    total_time = time.perf_counter() - start
    log.info("total training time: %s (%.4f s/it)",
             eta_string(1.0, int(total_time)),
             total_time / max(max_iter - start_iter, 1))
    return state
