"""Single-transfer batch transport: pack a step's whole input pytree into
ONE contiguous byte buffer on the host, ship it with ONE ``device_put``, and
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
train loop (triplet path: reference engine/trainer.py:215-216); this module
is the TPU-native replacement: the loader's producer thread packs +
transfers while the device executes the previous step, and the unpack is
free on device (XLA fuses the slices/bitcasts into the consumers).

Exactness: every leaf's RAW BYTES are copied into a flat uint8 buffer and
bitcast back to the leaf dtype on device (``lax.bitcast_convert_type``) —
bit-exact for every dtype with no range caveats, and byte-minimal: a uint8
image leaf (``TPU.TRANSPORT_PIXELS``) costs 1 byte/pixel on the wire where
the round-1..4 f32 value-packer cost 4 (the wire is the system bottleneck
on relayed attachments — PERFORMANCE.md §Host input pipeline). bool leaves
travel as one 0/1 byte.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


class BatchPacker:
    """Pack/unpack a fixed-structure pytree of arrays through one uint8
    buffer.

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
        # byte extents; every leaf offset aligned to its itemsize so the
        # device-side reshape-to-itemsize-columns is a plain view
        offs, total = [], 0
        for d, s in zip(self.dtypes, self.shapes):
            item = 1 if d.kind == "b" else d.itemsize
            total = -(-total // item) * item  # round up to alignment
            offs.append(total)
            total += int(np.prod(s, dtype=np.int64)) * item
        self.offsets = tuple(offs)
        self.total = int(total)

    def _nbytes(self, i: int) -> int:
        d = self.dtypes[i]
        item = 1 if d.kind == "b" else d.itemsize
        return int(np.prod(self.shapes[i], dtype=np.int64)) * item

    def pack(self, tree: Any) -> np.ndarray:
        """Host-side: flatten ``tree`` into one [total] uint8 numpy buffer
        (raw bytes, bit-exact)."""
        leaves = self.treedef.flatten_up_to(tree)
        buf = np.empty((self.total,), np.uint8)
        for i, leaf in enumerate(leaves):
            a = np.asarray(leaf)
            if a.shape != self.shapes[i]:
                raise ValueError(
                    f"leaf shape {a.shape} != packed {self.shapes[i]}")
            if a.dtype != self.dtypes[i]:
                raise ValueError(
                    f"leaf dtype {a.dtype} != packed {self.dtypes[i]}")
            if self.dtypes[i].kind == "b":
                raw = a.astype(np.uint8).reshape(-1)
            else:
                raw = np.ascontiguousarray(a).view(np.uint8).reshape(-1)
            buf[self.offsets[i]:self.offsets[i] + raw.size] = raw
        return buf

    def unpack(self, packed: jnp.ndarray) -> Any:
        """Device-side (trace under jit): rebuild the original pytree."""
        leaves = []
        for i, (off, dt, shape) in enumerate(zip(self.offsets, self.dtypes,
                                                 self.shapes)):
            n = self._nbytes(i)
            raw = jax.lax.slice(packed, (off,), (off + n,))
            if dt.kind == "b":
                x = raw.reshape(shape) != 0
            elif dt.itemsize == 1:
                x = raw.reshape(shape)
                if dt != np.uint8:
                    x = jax.lax.bitcast_convert_type(x, jnp.dtype(dt))
            else:
                x = jax.lax.bitcast_convert_type(
                    raw.reshape((-1, dt.itemsize)), jnp.dtype(dt)
                ).reshape(shape)
            leaves.append(x)
        return jax.tree.unflatten(self.treedef, leaves)

    def unpack_np(self, packed: np.ndarray) -> Any:
        """Host-side inverse of ``pack`` (tests, init samples)."""
        packed = np.asarray(packed, np.uint8)
        leaves = []
        for i, (off, dt, shape) in enumerate(zip(self.offsets, self.dtypes,
                                                 self.shapes)):
            raw = packed[off:off + self._nbytes(i)]
            if dt.kind == "b":
                x = raw.reshape(shape) != 0
            else:
                x = raw.view(dt).reshape(shape)
            leaves.append(x)
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
