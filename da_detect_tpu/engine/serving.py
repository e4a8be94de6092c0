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
    if with_masks and with_keypoints:
        # the model's apply precedence would silently win; an exporter must
        # not guess which head the artifact should carry
        raise ValueError("with_masks and with_keypoints are mutually "
                         "exclusive — export one artifact per head")
    if with_masks:
        return lambda v, b: model.apply(v, b, with_masks=True)
    if with_keypoints:
        return lambda v, b: model.apply(v, b, with_keypoints=True)
    return lambda v, b: model.apply(v, b)


def _export_in_subprocess(exp_bytes: bytes, meta: dict):
    """Compile+serialize ``exp_bytes`` in a fresh interpreter (see
    ``_serving_worker`` for why) and return (payload, in_tree, out_tree)."""
    import os
    import subprocess
    import sys
    import tempfile

    import da_detect_tpu

    pkg_root = os.path.dirname(os.path.dirname(
        os.path.abspath(da_detect_tpu.__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
    with tempfile.TemporaryDirectory(prefix="da_serving_") as tmp:
        req = os.path.join(tmp, "request.pkl")
        reply = os.path.join(tmp, "reply.pkl")
        with open(req, "wb") as f:
            pickle.dump(dict(payload=exp_bytes, platform=meta["platform"],
                             num_devices=meta["num_devices"]), f)
        try:
            # compiles are minutes, not hours — a hung XLA compile in the
            # worker must surface instead of blocking export forever
            proc = subprocess.run(
                [sys.executable, "-m", "da_detect_tpu.engine._serving_worker",
                 req, reply],
                env=env, capture_output=True, text=True, timeout=1800)
        except subprocess.TimeoutExpired as e:
            tail = "\n".join(
                (e.stderr or "").splitlines()[-15:]) if e.stderr else "<none>"
            raise RuntimeError(
                "pristine serving-export worker timed out after "
                f"{e.timeout:.0f}s; stderr tail:\n{tail}") from e
        if proc.returncode != 0:
            tail = "\n".join(proc.stderr.splitlines()[-15:])
            raise RuntimeError(
                f"pristine serving-export worker failed "
                f"(rc={proc.returncode}):\n{tail}")
        with open(reply, "rb") as f:
            out = pickle.load(f)
    return out["payload"], out["aot_in_tree"], out["aot_out_tree"]


def batch_spec(cfg, batch_size: int = 1, image_dtype=jnp.float32):
    """Shape/dtype spec of the fixed eval canvas batch.

    ``image_dtype`` uint8 exports a raw-pixel server: clients ship 1
    byte/pixel and the exported program normalizes on device
    (ImageBatch.normalized — same win as TPU.TRANSPORT_PIXELS for
    training; the wire is the serving bottleneck on remote attachments)."""
    h, w = canvas_for(cfg, is_train=False)
    b = batch_size
    return ImageBatch(
        images=jax.ShapeDtypeStruct((b, h, w, 3), image_dtype),
        sizes=jax.ShapeDtypeStruct((b, 2), jnp.int32),
        orig_sizes=jax.ShapeDtypeStruct((b, 2), jnp.int32),
        is_source=jax.ShapeDtypeStruct((b,), jnp.bool_))


def export_serving(cfg, model, variables, out_path: str, *,
                   fmt: str = "aot", batch_size: int = 1,
                   with_masks: bool = False, with_keypoints: bool = False,
                   pristine: bool | None = None,
                   image_dtype=jnp.float32):
    """Export the jitted eval forward to ``out_path``.

    ``variables`` provides only the parameter *shapes* (specs are taken from
    it); the exported function still takes weights as its first argument.

    ``pristine`` (aot only): compile+serialize in a fresh subprocess instead
    of in-process. XLA:CPU mis-serializes executables compiled in a process
    with prior compilations (see ``_serving_worker`` for the bisect), so the
    default is True on CPU and False elsewhere (on TPU a second process
    cannot attach to the chip, and the corruption is CPU-specific).
    """
    if fmt not in ("aot", "stablehlo"):
        raise ValueError(f"unknown serving format {fmt!r}")
    fn = _eval_fn(model, with_masks, with_keypoints)
    var_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        variables)
    b_spec = batch_spec(cfg, batch_size, image_dtype)

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

    if fmt == "aot":
        # Trace/export here (capturing THIS process's numerics config), but
        # compile+serialize in a pristine subprocess by default on CPU:
        # XLA:CPU mis-serializes executables from processes with prior
        # compilations (dangling uniquified fusion names — _serving_worker).
        from jax import export as jexport
        exp_bytes = jexport.export(
            jax.jit(flat_fn, keep_unused=True))(*in_leaves).serialize()
        if pristine is None:
            pristine = meta["platform"] == "cpu"
        if pristine:
            payload, aot_in_tree, aot_out_tree = _export_in_subprocess(
                exp_bytes, meta)
        else:
            from ._serving_worker import compile_and_serialize
            cache_was = jax.config.jax_enable_compilation_cache
            jax.config.update("jax_enable_compilation_cache", False)
            try:
                payload, aot_in_tree, aot_out_tree = \
                    compile_and_serialize(exp_bytes)
            finally:
                jax.config.update("jax_enable_compilation_cache", cache_was)
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
        tree = jax.tree.structure((variables, batch))
        if tree != self._in_tree:
            raise ValueError(
                "variables/batch pytree structure does not match the "
                f"exported architecture:\n  artifact: {self._in_tree}\n"
                f"  call:     {tree}")
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
    """Load a serving artifact exported by :func:`export_serving`.

    .. warning:: Artifacts are pickles (inherent to
       ``jax.experimental.serialize_executable``); unpickling executes
       arbitrary code. Only load artifacts you exported yourself or obtained
       from a trusted source — treat them like model code, not like data.
    """
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
