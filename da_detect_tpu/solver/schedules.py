"""LR schedules.

* ``warmup_multistep``: reference solver/lr_scheduler.py:10-52
  (linear/constant warmup + step decay).
* ``warmup_cosine``: the triplet trainer's timm CosineLRScheduler
  (tools/train_net_triplet.py:66-81; t_in_epochs=False, warmup_prefix=False:
  cosine phase counts t from 0 including the warmup span).

Schedules are functions iteration -> lr usable inside a jitted update.
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_multistep(base_lr: float, steps, gamma: float = 0.1,
                     warmup_factor: float = 1.0 / 3, warmup_iters: int = 500,
                     warmup_method: str = "linear"):
    steps = tuple(sorted(steps))

    def schedule(it):
        it = jnp.asarray(it, jnp.float32)
        if warmup_method == "constant":
            wf = jnp.asarray(warmup_factor, jnp.float32)
        else:
            alpha = it / max(warmup_iters, 1)
            wf = warmup_factor * (1 - alpha) + alpha
        warm = jnp.where(it < warmup_iters, wf, 1.0)
        decay = gamma ** jnp.sum(jnp.asarray([it >= s for s in steps]))
        return base_lr * warm * decay

    return schedule


def warmup_cosine(base_lr: float, max_iter: int, lr_min: float = 1e-6,
                  warmup_lr_init: float = 1e-4, warmup_iters: int = 0):
    def schedule(it):
        it = jnp.asarray(it, jnp.float32)
        warm = warmup_lr_init + it * (base_lr - warmup_lr_init) / max(warmup_iters, 1)
        cos = lr_min + 0.5 * (base_lr - lr_min) * (
            1.0 + jnp.cos(jnp.pi * it / max_iter))
        return jnp.where(it < warmup_iters, warm, cos)

    return schedule


def make_lr_scheduler(cfg, kind: str = "multistep", base_scale: float = 1.0):
    """``base_scale`` scales only the base lr (NOT warmup_lr_init/lr_min),
    mirroring how both reference schedulers treat per-group lrs: torch
    WarmupMultiStepLR scales each group's base by warm*decay, and timm's
    CosineLRScheduler derives per-group base_values from the group lr while
    warmup_lr_init and lr_min are shared scalars."""
    s = cfg.SOLVER
    if kind == "cosine":
        return warmup_cosine(s.BASE_LR * base_scale, s.MAX_ITER, s.LR_MIN,
                             s.WARMUP_LR, s.WARMUP_ITERS)
    return warmup_multistep(s.BASE_LR * base_scale, s.STEPS, s.GAMMA,
                            s.WARMUP_FACTOR, s.WARMUP_ITERS, s.WARMUP_METHOD)
