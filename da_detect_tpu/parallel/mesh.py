"""Device mesh + sharding helpers.

The reference's only parallelism is NCCL data-parallel DDP (SURVEY §2.9).
TPU-native equivalent: a ``data`` mesh axis; the batch (leading axis) is
sharded over it, parameters/optimizer state are replicated, and XLA inserts
the gradient all-reduces over ICI automatically under jit — no hand-written
collectives (the analog of utils/comm.py dissolves into the compiler).

DA batches must keep each (source, positive, negative) triple co-located on
one device slice (SURVEY §5.8). The domain slices travel as three *separate*
[k, ...] batches (see GeneralizedRCNN.train_forward), each sharded over the
same ``data`` axis — device d gets rows [d*k/n, (d+1)*k/n) of every slice,
so triple i's three images always land together with no permutation step.

**Spatial partitioning** (``TPU.MESH_SPATIAL`` > 1) adds a second ``space``
mesh axis and splits every image canvas's H dimension over it
(``P("data", "space")`` on the NHWC batch). GSPMD then spatially partitions
the backbone convolutions across the ``space`` devices, inserting the halo
exchanges itself — the standard XLA recipe for scaling a convnet when the
per-device batch cannot go below one image (large canvases, few images).
Everything downstream of the backbone (ROI pooling, NMS, losses) resolves to
``data``-sharded or replicated layouts by sharding propagation; no model code
changes. Equivalence with the 1-device step is proven in
tests/test_spatial_partition.py. The reference has no counterpart (DDP
cannot split a convolution).

Multi-host: call jax.distributed.initialize() before building the mesh
(engine.trainer does when env vars are present).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = -1, devices=None, spatial: int = 1) -> Mesh:
    """Build the device mesh.

    spatial == 1 (default): 1-D ``("data",)`` mesh over the devices.
    spatial  > 1: 2-D ``("data", "space")`` mesh — ``num_devices`` total
    devices folded into ``(num_devices // spatial, spatial)``.
    """
    devs = list(devices if devices is not None else jax.devices())
    if num_devices and num_devices > 0:
        devs = devs[:num_devices]
    if spatial <= 1:
        return Mesh(np.asarray(devs), axis_names=("data",))
    if len(devs) % spatial != 0:
        raise ValueError(
            f"{len(devs)} devices not divisible by spatial axis {spatial}")
    grid = np.asarray(devs).reshape(len(devs) // spatial, spatial)
    return Mesh(grid, axis_names=("data", "space"))


def _spatial_size(mesh: Mesh) -> int:
    return dict(mesh.shape).get("space", 1)


def data_axis_size(mesh: Mesh) -> int:
    return dict(mesh.shape).get("data", 1)


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


class BatchSharding:
    """Pytree-aware batch placement for a (possibly spatial) mesh.

    Every leaf is sharded over its leading axis on ``data``; image canvases
    (``ImageBatch.images`` [B, H, W, 3]) are additionally split over
    ``space`` on H. On a 1-D mesh this degrades to plain data sharding.

    Quacks like a NamedSharding where the loader needs it (``.mesh``), and
    exposes ``.put(tree)`` which ``put_batch`` dispatches to.
    """

    def __init__(self, mesh: Mesh):
        self.mesh = mesh
        self.data = NamedSharding(mesh, P("data"))
        self.image = (NamedSharding(mesh, P("data", "space"))
                      if _spatial_size(mesh) > 1 else self.data)

    def put(self, tree):
        from ..structures.image_batch import ImageBatch

        def go(node):
            if isinstance(node, ImageBatch):
                return ImageBatch(
                    images=jax.device_put(node.images, self.image),
                    sizes=jax.device_put(node.sizes, self.data),
                    orig_sizes=jax.device_put(node.orig_sizes, self.data),
                    is_source=jax.device_put(node.is_source, self.data))
            return jax.device_put(node, self.data)

        return jax.tree_util.tree_map(
            go, tree, is_leaf=lambda n: isinstance(n, ImageBatch))


def batch_sharding(mesh: Mesh) -> BatchSharding:
    return BatchSharding(mesh)


def put_batch(tree, sharding):
    """device_put ``tree`` with either a plain (Named)Sharding or a
    BatchSharding; None passes through."""
    if sharding is None:
        return tree
    if hasattr(sharding, "put"):
        return sharding.put(tree)
    return jax.device_put(tree, sharding)


def replicate(tree, mesh: Mesh):
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_batch(tree, mesh: Mesh):
    """Shard every leaf over its leading axis (canvas H additionally over
    ``space`` when the mesh has one)."""
    return BatchSharding(mesh).put(tree)


def check_divisible(batch_size: int, mesh: Mesh, group: int = 1):
    n = data_axis_size(mesh)
    if (batch_size // group) % n != 0:
        raise ValueError(
            f"batch of {batch_size // group} groups not divisible by "
            f"{n}-device data mesh")
