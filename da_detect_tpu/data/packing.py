"""Single-transfer batch transport: pack a step's whole input pytree into
ONE contiguous f32 buffer on the host, ship it with ONE ``device_put``, and
reconstruct the pytree on device inside the consuming jitted program.

Why this exists: on relayed/remote TPU attachments every host->device
transfer pays a fixed round-trip latency (measured ~23 ms per ``device_put``
on the tunneled bench chip). A DA-triplet train step's inputs are ~21 pytree
leaves; dispatching the step on numpy arguments therefore costs ~21
round-trips (~0.5 s) against a 64 ms device step. Packing makes the
transport cost one round-trip + one bulk transfer, independent of how many
leaves the step consumes. On directly-attached devices it is harmless (one
large copy instead of several smaller ones).

The reference streams CPU tensors into ``.to(device)`` per tensor inside its
train loop (reference engine/trainer.py:224-226); this module is the
TPU-native replacement: the loader's producer thread packs + transfers while
the device executes the previous step, and the unpack is free on device
(XLA fuses the slices into the consumers).

Exactness: every leaf is VALUE-cast to f32 for transport and cast back on
device. This is exact for all loader dtypes — f32 stays f32; i32 leaves
(labels, sizes) are exact in f32 below 2**24 (asserted at pack time); bool
round-trips as 0/1. No bit-level tricks, so the packed buffer is also a
plain debuggable array.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

_I24 = 1 << 24  # f32 holds integers exactly below this


class BatchPacker:
    """Pack/unpack a fixed-structure pytree of arrays through one f32 buffer.

    Built once from an example step input (structure, shapes and dtypes must
    stay fixed across steps — the loaders guarantee static shapes). ``pack``
    runs on host numpy; ``unpack`` runs under jit on the device buffer.
    """

    def __init__(self, example_tree: Any):
        leaves, self.treedef = jax.tree.flatten(example_tree)
        self.shapes = tuple(l.shape for l in leaves)
        self.dtypes = tuple(np.dtype(l.dtype) for l in leaves)
        for d in self.dtypes:
            if d.kind not in "fiub":
                raise TypeError(f"unsupported leaf dtype {d}")
        sizes = tuple(int(np.prod(s, dtype=np.int64)) for s in self.shapes)
        self.offsets = tuple(int(o) for o in np.cumsum((0,) + sizes)[:-1])
        self.sizes = sizes
        self.total = int(sum(sizes))

    def pack(self, tree: Any) -> np.ndarray:
        """Host-side: flatten ``tree`` into one [total] f32 numpy buffer."""
        leaves = self.treedef.flatten_up_to(tree)
        buf = np.empty((self.total,), np.float32)
        for leaf, off, size, dt, shape in zip(
                leaves, self.offsets, self.sizes, self.dtypes, self.shapes):
            a = np.asarray(leaf)
            if a.shape != shape:
                raise ValueError(f"leaf shape {a.shape} != packed {shape}")
            if dt.kind in "iu" and a.size and abs(a).max() >= _I24:
                raise ValueError(
                    f"integer leaf exceeds exact-f32 range (max {a.max()})")
            buf[off:off + size] = a.astype(np.float32, copy=False).ravel()
        return buf

    def unpack(self, packed: jnp.ndarray) -> Any:
        """Device-side (trace under jit): rebuild the original pytree."""
        leaves = []
        for off, size, dt, shape in zip(self.offsets, self.sizes,
                                        self.dtypes, self.shapes):
            x = jax.lax.slice(packed, (off,), (off + size,)).reshape(shape)
            if dt.kind == "b":
                x = x != 0
            elif np.dtype(dt) != np.float32:
                x = x.astype(dt)
            leaves.append(x)
        return jax.tree.unflatten(self.treedef, leaves)

    def unpack_np(self, packed: np.ndarray) -> Any:
        """Host-side inverse of ``pack`` (tests, init samples)."""
        packed = np.asarray(packed)
        leaves = []
        for off, size, dt, shape in zip(self.offsets, self.sizes,
                                        self.dtypes, self.shapes):
            x = packed[off:off + size].reshape(shape)
            leaves.append(x != 0 if dt.kind == "b" else x.astype(dt))
        return jax.tree.unflatten(self.treedef, leaves)

    # hashable/eq by spec: a BatchPacker is passed as a STATIC jit argument,
    # so two loaders' packers with the same layout share one compiled step
    # and a different layout (e.g. the portrait-orientation canvas bucket)
    # gets its own trace instead of silently mis-slicing.
    def _key(self):
        return (self.treedef, self.shapes, self.dtypes)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return (isinstance(other, BatchPacker)
                and self._key() == other._key())
