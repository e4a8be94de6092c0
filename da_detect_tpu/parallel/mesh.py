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

**Tensor parallelism** (``TPU.MESH_MODEL`` > 1) adds a ``model`` mesh axis
and shards every *wide trailing channel axis* of the parameter/optimizer
pytrees over it (conv HWIO kernels on O, dense kernels on out, biases and
frozen BN vectors on C — anything with last dim >= 256 and divisible by the
axis). The train/eval step functions are unchanged: GSPMD propagates the
channel shardings through the convolutions and matmuls and inserts the
all-gathers / reduce-scatters itself, exactly the Megatron-style column
split, compiler-derived instead of hand-written. Use when one chip cannot
hold the model + optimizer (X-101-scale backbones at large canvases) or to
cut per-chip HBM pressure below the remat threshold. Composes with ``data``
(and ``space``): mesh (data, space, model). Equivalence with the pure-dp
step is proven in tests/test_tensor_parallel.py. The reference has no
counterpart (DDP replicates parameters by construction).

Multi-host: call jax.distributed.initialize() before building the mesh
(engine.trainer does when env vars are present).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = -1, devices=None, spatial: int = 1,
              model: int = 1) -> Mesh:
    """Build the device mesh.

    Always has a leading ``data`` axis; a ``space`` axis is appended when
    ``spatial`` > 1 (canvas-H partitioning) and a trailing ``model`` axis
    when ``model`` > 1 (channel-sharded parameters). ``num_devices`` total
    devices fold into ``(num_devices // (spatial*model), spatial?, model?)``
    so the fastest-varying (most ICI-adjacent) devices carry the
    highest-bandwidth collectives (tensor-parallel all-gathers).
    """
    devs = list(devices if devices is not None else jax.devices())
    if num_devices and num_devices > 0:
        devs = devs[:num_devices]
    inner = spatial * model
    if len(devs) % inner != 0:
        raise ValueError(
            f"{len(devs)} devices not divisible by spatial*model = {inner}")
    shape, names = [len(devs) // inner], ["data"]
    if spatial > 1:
        shape.append(spatial)
        names.append("space")
    if model > 1:
        shape.append(model)
        names.append("model")
    return Mesh(np.asarray(devs).reshape(shape), axis_names=tuple(names))


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


def model_axis_size(mesh: Mesh) -> int:
    return dict(mesh.shape).get("model", 1)


def replicate(tree, mesh: Mesh):
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_model(tree, mesh: Mesh, min_channels: int = 256):
    """Tensor-parallel placement of a parameter/optimizer/state pytree.

    Each leaf whose trailing axis is a wide channel dimension (>=
    ``min_channels`` and divisible by the ``model`` axis) is sharded over
    ``model`` on that axis — conv HWIO kernels on O, dense kernels on out,
    biases / frozen BN vectors on C; everything else (scalars, small heads,
    rng keys, schedule counters) is replicated. The jitted step needs no
    changes: GSPMD propagates the channel shardings through the network and
    inserts the collectives (Megatron-style column parallelism, derived by
    the compiler). On a mesh without a ``model`` axis this is ``replicate``.
    """
    m = model_axis_size(mesh)
    if m <= 1:
        return replicate(tree, mesh)

    def place(x):
        shape = getattr(x, "shape", ())
        if (len(shape) >= 1 and shape[-1] >= min_channels
                and shape[-1] % m == 0):
            spec = P(*([None] * (len(shape) - 1) + ["model"]))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)


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
