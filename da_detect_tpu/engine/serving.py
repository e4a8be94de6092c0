"""Ahead-of-time serving export.

The reference's serving surface is ``demo/predictor.py`` (COCODemo): build
the model in-process and pay the full compile on first use. On TPU that
first compile is the dominant cold-start cost (the 608x1216 eval program
takes minutes to compile over a remote-compile setup — TROUBLESHOOTING.md),
so production serving wants the program built *ahead of time*:

* ``fmt="aot"`` — the compiled XLA executable itself, serialized via
  ``jax.experimental.serialize_executable``. Loads in milliseconds and runs
  immediately, but only on the same device kind / topology it was compiled
  for (the artifact records both and ``load_serving`` enforces them).
* ``fmt="stablehlo"`` — a portable ``jax.export`` StableHLO artifact. Any
  backend can load it (XLA still compiles at load time), it needs no Python
  model code at all, and it version-pins the traced program.

Both formats export the *weight-agnostic* eval function ``(variables,
ImageBatch) -> Detections[...]`` lowered from shape specs, so one artifact
serves any checkpoint of the same architecture; weights are passed at call
time exactly like ``model.apply``.

Pytrees cross the artifact boundary as flat leaf tuples (the in/out
treedefs ride alongside in the artifact) so neither format needs custom
pytree serialization hooks.
"""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp

from ..data.transforms import canvas_for
from ..structures.image_batch import ImageBatch

_MAGIC = "da_detect_tpu.serving/v1"


def _eval_fn(model, with_masks: bool, with_keypoints: bool):
    if with_masks:
        return lambda v, b: model.apply(v, b, with_masks=True)
    if with_keypoints:
        return lambda v, b: model.apply(v, b, with_keypoints=True)
    return lambda v, b: model.apply(v, b)


def batch_spec(cfg, batch_size: int = 1):
    """Shape/dtype spec of the fixed eval canvas batch."""
    h, w = canvas_for(cfg, is_train=False)
    b = batch_size
    return ImageBatch(
        images=jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32),
        sizes=jax.ShapeDtypeStruct((b, 2), jnp.int32),
        orig_sizes=jax.ShapeDtypeStruct((b, 2), jnp.int32),
        is_source=jax.ShapeDtypeStruct((b,), jnp.bool_))


def export_serving(cfg, model, variables, out_path: str, *,
                   fmt: str = "aot", batch_size: int = 1,
                   with_masks: bool = False, with_keypoints: bool = False):
    """Export the jitted eval forward to ``out_path``.

    ``variables`` provides only the parameter *shapes* (specs are taken from
    it); the exported function still takes weights as its first argument.
    """
    if fmt not in ("aot", "stablehlo"):
        raise ValueError(f"unknown serving format {fmt!r}")
    fn = _eval_fn(model, with_masks, with_keypoints)
    var_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        variables)
    b_spec = batch_spec(cfg, batch_size)

    in_leaves, in_tree = jax.tree.flatten((var_spec, b_spec))
    out_spec = jax.eval_shape(fn, var_spec, b_spec)
    _, out_tree = jax.tree.flatten(out_spec)

    def flat_fn(*leaves):
        v, b = jax.tree.unflatten(in_tree, leaves)
        return tuple(jax.tree.leaves(fn(v, b)))

    meta = dict(
        magic=_MAGIC, format=fmt,
        canvas=tuple(canvas_for(cfg, is_train=False)),
        batch_size=batch_size,
        with_masks=with_masks, with_keypoints=with_keypoints,
        jax_version=jax.__version__,
        platform=jax.devices()[0].platform,
        device_kind=jax.devices()[0].device_kind,
        num_devices=jax.device_count(),
    )

    # keep_unused: XLA normally prunes args the program never reads (e.g. a
    # frozen stat the eval path ignores), which would desync the serialized
    # executable's calling convention from the (variables, batch) leaf list.
    if fmt == "aot":
        # Explicit fully-replicated input shardings: a deserialized
        # executable is loaded over every addressable device and does NOT
        # auto-commit inputs like jit does, so the compile-time layout must
        # match what the loader will reconstruct (single- and multi-device
        # backends alike; load_serving re-places inputs accordingly).
        import numpy as _np
        from jax.sharding import Mesh, NamedSharding, PartitionSpec
        repl = NamedSharding(Mesh(_np.array(jax.devices()), ("d",)),
                             PartitionSpec())
        jfn = jax.jit(flat_fn, keep_unused=True, in_shardings=repl)
        from jax.experimental.serialize_executable import serialize
        # compile with the persistent compilation cache OFF: serializing an
        # executable that was itself deserialized from the cache produces an
        # artifact with dangling auxiliary-function references (XLA:CPU
        # "Buffer Definition Event: Function ... not found" at run time) —
        # an export must be a genuine fresh compile
        cache_was = jax.config.jax_enable_compilation_cache
        jax.config.update("jax_enable_compilation_cache", False)
        try:
            compiled = jfn.lower(*in_leaves).compile()
        finally:
            jax.config.update("jax_enable_compilation_cache", cache_was)
        payload, aot_in_tree, aot_out_tree = serialize(compiled)
        blob = dict(meta=meta, payload=payload, in_tree=in_tree,
                    out_tree=out_tree, aot_in_tree=aot_in_tree,
                    aot_out_tree=aot_out_tree)
    else:
        # no sharding annotations: an un-annotated export stays portable
        # across device counts (an 8-device-meshed one refuses to load on 1)
        from jax import export as jexport
        exp = jexport.export(jax.jit(flat_fn, keep_unused=True))(*in_leaves)
        blob = dict(meta=meta, payload=exp.serialize(), in_tree=in_tree,
                    out_tree=out_tree)

    with open(out_path, "wb") as f:
        pickle.dump(blob, f)
    return meta


class ServingModel:
    """Loaded serving artifact: call as ``serving(variables, batch)`` —
    same contract as the in-process jitted eval step."""

    def __init__(self, call_flat, in_tree, out_tree, meta):
        self._call = call_flat
        self._in_tree = in_tree
        self._out_tree = out_tree
        self.meta = meta

    def __call__(self, variables, batch: ImageBatch):
        leaves = jax.tree.leaves((variables, batch))
        out = self._call(*leaves)
        # block before returning: overlapping a second dispatch of a
        # deserialized executable with an unfetched prior result can drop
        # the prior result's definition event on some backends (observed on
        # XLA:CPU), and serving calls are synchronous anyway
        return jax.block_until_ready(
            jax.tree.unflatten(self._out_tree, list(out)))


def load_serving(path: str, *, allow_device_mismatch: bool = False
                 ) -> ServingModel:
    with open(path, "rb") as f:
        blob = pickle.load(f)
    meta = blob["meta"]
    if meta.get("magic") != _MAGIC:
        raise ValueError(f"{path} is not a da_detect_tpu serving artifact")

    if meta["format"] == "aot":
        dev = jax.devices()[0]
        same = (meta["platform"] == dev.platform
                and meta["device_kind"] == dev.device_kind
                and meta["num_devices"] == jax.device_count())
        if not same and not allow_device_mismatch:
            raise RuntimeError(
                "AOT serving artifact was compiled for "
                f"{meta['num_devices']}x {meta['device_kind']} "
                f"({meta['platform']}) but this process sees "
                f"{jax.device_count()}x {dev.device_kind} ({dev.platform}). "
                "Re-export, use fmt='stablehlo' for portability, or pass "
                "allow_device_mismatch=True at your own risk.")
        from jax.experimental.serialize_executable import \
            deserialize_and_load
        compiled = deserialize_and_load(blob["payload"], blob["aot_in_tree"],
                                        blob["aot_out_tree"])
        # the loaded executable takes inputs exactly as laid out at compile
        # time (e.g. replicated over all devices of a multi-device backend);
        # unlike jit it does not auto-commit, so place them explicitly
        in_shardings = jax.tree.leaves(compiled.input_shardings[0])

        def call(*leaves):
            if len(leaves) != len(in_shardings):
                raise ValueError(
                    f"artifact expects {len(in_shardings)} input leaves, "
                    f"got {len(leaves)} — variables/batch structure does "
                    "not match the exported architecture")
            leaves = [jax.device_put(x, s)
                      for x, s in zip(leaves, in_shardings)]
            return compiled(*leaves)
    else:
        from jax import export as jexport
        exp = jexport.deserialize(blob["payload"])
        call = jax.jit(exp.call)

    return ServingModel(call, blob["in_tree"], blob["out_tree"], meta)
