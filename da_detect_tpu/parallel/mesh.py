"""Device mesh + sharding helpers.

The reference's only parallelism is NCCL data-parallel DDP (SURVEY §2.9).
TPU-native equivalent: a 1-D ``data`` mesh; the batch (leading axis) is
sharded over it, parameters/optimizer state are replicated, and XLA inserts
the gradient all-reduces over ICI automatically under jit — no hand-written
collectives (the analog of utils/comm.py dissolves into the compiler).

DA batches must keep each (source, positive, negative) triple co-located on
one device (SURVEY §5.8). The domain slices travel as three *separate*
[k, ...] batches (see GeneralizedRCNN.train_forward), each sharded over the
same ``data`` axis — device d gets rows [d*k/n, (d+1)*k/n) of every slice,
so triple i's three images always land together with no permutation step.

Multi-host: call jax.distributed.initialize() before building the mesh
(engine.trainer does when env vars are present).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = -1, devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if num_devices and num_devices > 0:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), axis_names=("data",))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicate(tree, mesh: Mesh):
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_batch(tree, mesh: Mesh):
    """Shard every leaf over its leading axis."""
    s = NamedSharding(mesh, P("data"))
    return jax.device_put(tree, s)


def check_divisible(batch_size: int, mesh: Mesh, group: int = 1):
    n = mesh.devices.size
    if (batch_size // group) % n != 0:
        raise ValueError(
            f"batch of {batch_size // group} groups not divisible by "
            f"{n}-device data mesh")
