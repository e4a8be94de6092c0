"""Fixed-capacity box container.

TPU-native replacement for the reference's ``BoxList``
(reference: maskrcnn_benchmark/structures/bounding_box.py:9-266). BoxList is a
dynamic-length Nx4 tensor plus a dict of per-box fields; under XLA everything
must be static, so ``Boxes`` is a *padded* struct-of-arrays pytree: a fixed
capacity ``N`` of xyxy rows, a validity mask, and a dict of per-box field
arrays. All geometric ops are mask-preserving and jit/vmap-safe.

Coordinates are always xyxy in the (padded) input-image frame. The reference's
"xywh" mode exists only at COCO I/O boundaries and is handled by
``ops.box_ops.xyxy_to_xywh`` there.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
from flax import struct

from ..ops import box_ops


@struct.dataclass
class Boxes:
    xyxy: jnp.ndarray                 # [..., N, 4] float32
    valid: jnp.ndarray                # [..., N] bool
    fields: Dict[str, jnp.ndarray] = struct.field(default_factory=dict)

    # -- construction ------------------------------------------------------
    @classmethod
    def empty(cls, capacity: int, batch_shape: tuple = (), **fields) -> "Boxes":
        shape = (*batch_shape, capacity)
        return cls(
            xyxy=jnp.zeros((*shape, 4), jnp.float32),
            valid=jnp.zeros(shape, bool),
            fields=dict(fields),
        )

    @property
    def capacity(self) -> int:
        return self.xyxy.shape[-2]

    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.valid, axis=-1)

    # -- fields ------------------------------------------------------------
    def with_fields(self, **new_fields) -> "Boxes":
        f = dict(self.fields)
        f.update(new_fields)
        return self.replace(fields=f)

    def get_field(self, name: str) -> jnp.ndarray:
        return self.fields[name]

    def has_field(self, name: str) -> bool:
        return name in self.fields

    # -- geometry (mirrors BoxList.resize/transpose/clip/area) -------------
    def area(self, legacy_plus1: bool = True) -> jnp.ndarray:
        return jnp.where(self.valid, box_ops.box_area(self.xyxy, legacy_plus1), 0.0)

    def scale(self, scale_y, scale_x) -> "Boxes":
        return self.replace(xyxy=box_ops.scale_boxes(self.xyxy, scale_y, scale_x))

    def hflip(self, image_width) -> "Boxes":
        """Horizontal flip within a width-``image_width`` frame
        (reference bounding_box.py `transpose(FLIP_LEFT_RIGHT)`)."""
        return self.replace(xyxy=box_ops.hflip_boxes(self.xyxy, image_width))

    def clip_to_image(self, height, width) -> "Boxes":
        return self.replace(xyxy=box_ops.clip_boxes(self.xyxy, height, width))

    def prune_small(self, min_size: float, legacy_plus1: bool = True) -> "Boxes":
        keep = box_ops.min_size_mask(self.xyxy, min_size, legacy_plus1)
        return self.replace(valid=self.valid & keep)

    # -- gather (replaces BoxList.__getitem__ with index tensors) ----------
    def take(self, indices: jnp.ndarray, indices_valid: jnp.ndarray | None = None) -> "Boxes":
        """Gather rows along the box axis. ``indices`` [..., K] int32."""
        xyxy = jnp.take_along_axis(self.xyxy, indices[..., None], axis=-2)
        valid = jnp.take_along_axis(self.valid, indices, axis=-1)
        if indices_valid is not None:
            valid = valid & indices_valid
        fields = {}
        for k, v in self.fields.items():
            idx = indices
            if v.ndim > valid.ndim:
                idx = indices.reshape(indices.shape + (1,) * (v.ndim - valid.ndim))
            fields[k] = jnp.take_along_axis(v, idx, axis=indices.ndim - 1)
        return Boxes(xyxy=xyxy, valid=valid, fields=fields)


def concat_boxes(boxes: list[Boxes]) -> Boxes:
    """Concatenate along the capacity axis (reference boxlist_ops.cat_boxlist)."""
    keys = set(boxes[0].fields)
    assert all(set(b.fields) == keys for b in boxes), "field mismatch in concat_boxes"
    return Boxes(
        xyxy=jnp.concatenate([b.xyxy for b in boxes], axis=-2),
        valid=jnp.concatenate([b.valid for b in boxes], axis=-1),
        fields={k: jnp.concatenate([b.fields[k] for b in boxes], axis=boxes[0].valid.ndim - 1)
                for k in keys},
    )
