"""Multi-host coordination helpers.

The reference's utils/comm.py:13-117 is the whole NCCL surface
(get_rank/get_world_size/synchronize/all_gather-of-pickles/reduce_dict).
Under jax SPMD the *device* collectives dissolve into the compiler; what
remains host-side is cross-process coordination for eval gathering and
logging — provided here on jax.experimental.multihost_utils.
"""

from __future__ import annotations

import pickle
from typing import Any

import jax
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def synchronize(name: str = "barrier") -> None:
    """Cross-process barrier (reference comm.synchronize)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def all_gather(data: Any) -> list[Any]:
    """Gather arbitrary picklable objects from every process (the reference's
    pickle-over-ByteTensor all_gather, comm.py:56-88, rebuilt on
    broadcast_one_to_all per rank)."""
    world = jax.process_count()
    if world == 1:
        return [data]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(data), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(
        np.asarray([payload.size], np.int64))
    max_size = int(sizes.max())
    padded = np.zeros(max_size, np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    out = []
    for rank in range(world):
        out.append(pickle.loads(gathered[rank, : int(sizes[rank, 0])].tobytes()))
    return out


def reduce_dict(d: dict[str, float], average: bool = True) -> dict[str, float]:
    """Mean/sum scalar dicts across processes for logging
    (reference comm.reduce_dict / trainer.reduce_loss_dict)."""
    world = jax.process_count()
    if world == 1:
        return dict(d)
    gathered = all_gather(d)
    out = {}
    for k in d:
        vals = [g[k] for g in gathered]
        out[k] = sum(vals) / (world if average else 1)
    return out


def accumulate_predictions(predictions: dict) -> dict:
    """Merge per-process eval prediction dicts onto every process
    (reference inference._accumulate_predictions_from_multiple_gpus)."""
    merged: dict = {}
    for part in all_gather(predictions):
        merged.update(part)
    return merged
