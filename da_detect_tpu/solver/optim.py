"""Optimizer: SGD + momentum with Detectron per-param rules.

Reference solver/build.py:7-20: biases get 2x lr and no weight decay;
everything else BASE_LR + WEIGHT_DECAY. torch-SGD semantics (decay added to
the gradient *before* the momentum buffer). Backbone stage freezing
(FREEZE_CONV_BODY_AT, reference resnet.py:127-136 requires_grad=False) is an
update mask here — frozen subtrees get zero updates and no decay.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


def param_labels(params, freeze_at: int) -> dict:
    """Label tree: 'frozen' | 'bias' | 'weight' by path."""
    frozen_prefixes = []
    if freeze_at > 0:
        frozen_prefixes.append(("backbone", "body", "stem"))
        for i in range(1, freeze_at):
            frozen_prefixes.append(("backbone", "body", f"layer{i}"))

    def label(path, leaf):
        keys = tuple(getattr(p, "key", getattr(p, "name", str(p))) for p in path)
        for pref in frozen_prefixes:
            if keys[: len(pref)] == pref:
                return "frozen"
        return "bias" if keys and keys[-1] == "bias" else "weight"

    return jax.tree_util.tree_map_with_path(label, params)


class SGDState(NamedTuple):
    momentum: optax.Params


def detectron_sgd(lr_schedule: Callable, momentum: float, weight_decay: float,
                  weight_decay_bias: float, bias_lr_factor: float,
                  labels, *,
                  bias_lr_schedule: Callable | None = None
                  ) -> optax.GradientTransformation:
    """counts on update(..., params=...) and an int step passed via the
    opt-state-free schedule: we thread the iteration through `step` inside
    the optimizer state.

    ``bias_lr_schedule`` overrides the multiplicative ``bias_lr_factor``
    with a full per-group schedule — needed for cosine parity with the
    reference triplet trainer, where timm's CosineLRScheduler warms every
    param group up from the SAME warmup_lr_init and anneals to the SAME
    lr_min; only the base value is scaled per group (Scheduler.base_values
    = each group's initial lr). A plain factor x schedule(t) would scale
    the warmup floor and lr_min too."""

    def init(params):
        return (jnp.zeros([], jnp.int32),
                SGDState(momentum=jax.tree_util.tree_map(jnp.zeros_like, params)))

    def update(grads, state, params):
        step, sgd = state
        lr = lr_schedule(step)
        lr_bias = (bias_lr_schedule(step) if bias_lr_schedule is not None
                   else bias_lr_factor * lr)

        def upd(g, p, m, lab):
            if lab == "frozen":
                return jnp.zeros_like(g), m
            wd = weight_decay_bias if lab == "bias" else weight_decay
            step_lr = lr_bias if lab == "bias" else lr
            d = g + wd * p
            m_new = momentum * m + d
            return -step_lr * m_new, m_new

        out = jax.tree_util.tree_map(upd, grads, params, sgd.momentum, labels)
        updates = jax.tree_util.tree_map(lambda x: x[0], out,
                                         is_leaf=lambda x: isinstance(x, tuple))
        new_m = jax.tree_util.tree_map(lambda x: x[1], out,
                                       is_leaf=lambda x: isinstance(x, tuple))
        return updates, (step + 1, SGDState(momentum=new_m))

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg, params, schedule_kind: str = "multistep"):
    from .schedules import make_lr_scheduler
    s = cfg.SOLVER
    labels = param_labels(params, cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT)
    sched = make_lr_scheduler(cfg, schedule_kind)
    # biases get their own schedule with base lr x BIAS_LR_FACTOR: for
    # multistep this equals factor x schedule (purely multiplicative); for
    # cosine it reproduces timm's per-group base_values semantics (shared
    # warmup_lr_init / lr_min, scaled base) — see detectron_sgd
    sched_bias = make_lr_scheduler(cfg, schedule_kind,
                                   base_scale=s.BIAS_LR_FACTOR)
    tx = detectron_sgd(sched, s.MOMENTUM, s.WEIGHT_DECAY, s.WEIGHT_DECAY_BIAS,
                       s.BIAS_LR_FACTOR, labels, bias_lr_schedule=sched_bias)
    return tx, sched
