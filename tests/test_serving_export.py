"""AOT serving export: artifact roundtrips reproduce the in-process jitted
eval forward exactly (both formats), and the AOT device guard trips on a
topology mismatch."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from da_detect_tpu.config import get_cfg
from da_detect_tpu.engine.serving import (batch_spec, export_serving,
                                          load_serving)
from da_detect_tpu.models import build_detection_model
from da_detect_tpu.structures.image_batch import ImageBatch


@pytest.fixture(scope="module")
def tiny_eval_setup():
    cfg = get_cfg()
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 96
    cfg.TPU.IMAGE_SHAPE = (0, 0)
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 100
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 20
    cfg.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 10
    model = build_detection_model(cfg)
    spec = batch_spec(cfg, 1)
    rng = np.random.RandomState(0)
    batch = ImageBatch(
        images=jnp.asarray(rng.randn(*spec.images.shape), jnp.float32),
        sizes=jnp.asarray([[64, 96]], jnp.int32),
        orig_sizes=jnp.asarray([[64, 96]], jnp.int32),
        is_source=jnp.ones((1,), bool))
    variables = dict(model.init({"params": jax.random.PRNGKey(0)}, batch))
    ref = jax.jit(lambda v, b: model.apply(v, b))(variables, batch)
    return cfg, model, variables, batch, ref


@pytest.mark.parametrize("fmt", ["aot", "stablehlo"])
def test_serving_roundtrip_matches_jit(tiny_eval_setup, tmp_path, fmt):
    cfg, model, variables, batch, ref = tiny_eval_setup
    path = str(tmp_path / f"serving_{fmt}.pkl")
    meta = export_serving(cfg, model, variables, path, fmt=fmt)
    assert meta["canvas"] == (64, 96) and meta["format"] == fmt
    assert os.path.getsize(path) > 1000

    serving = load_serving(path)
    out = serving(variables, batch)
    ref_leaves = jax.tree.leaves(ref)
    out_leaves = jax.tree.leaves(out)
    assert len(ref_leaves) == len(out_leaves)
    for a, b in zip(ref_leaves, out_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    # output structure survives the flat-leaf boundary (Detections fields)
    assert jax.tree.structure(out) == jax.tree.structure(ref)


def test_aot_device_guard(tiny_eval_setup, tmp_path):
    cfg, model, variables, batch, ref = tiny_eval_setup
    path = str(tmp_path / "serving_guard.pkl")
    export_serving(cfg, model, variables, path, fmt="aot")

    import pickle
    with open(path, "rb") as f:
        blob = pickle.load(f)
    blob["meta"]["device_kind"] = "TPU v99"
    with open(path, "wb") as f:
        pickle.dump(blob, f)

    with pytest.raises(RuntimeError, match="TPU v99"):
        load_serving(path)


def test_export_after_prior_compiles(tiny_eval_setup, tmp_path):
    """Round-2 regression: an AOT artifact exported from a process with
    prior compilations (persistent cache ON — the canonical suite state)
    failed to run ANYWHERE with "Buffer Definition Event: Function
    convert_convert_fusion.54 not found" (XLA:CPU serializes dangling
    uniquified fusion names from earlier compiles). The pristine-subprocess
    export must be immune to this process's compile history."""
    cfg, model, variables, batch, ref = tiny_eval_setup
    # dirty this process: unrelated jitted compilations, cache enabled
    for k in range(3):
        f = jax.jit(lambda x: jnp.sin(x) @ x.T + jnp.float32(k) *
                    x.astype(jnp.bfloat16).astype(jnp.float32))
        jax.block_until_ready(f(jnp.ones((16, 16), jnp.float32)))

    path = str(tmp_path / "serving_dirty.pkl")
    export_serving(cfg, model, variables, path, fmt="aot")
    serving = load_serving(path)
    out = serving(variables, batch)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_serving_rejects_structure_mismatch(tiny_eval_setup, tmp_path):
    """A variables pytree with a different structure must be rejected
    up-front (not bound positionally by leaf order)."""
    cfg, model, variables, batch, ref = tiny_eval_setup
    path = str(tmp_path / "serving_struct.pkl")
    export_serving(cfg, model, variables, path, fmt="stablehlo")
    serving = load_serving(path)
    renamed = {"params_oops": variables["params"],
               **{k: v for k, v in variables.items() if k != "params"}}
    with pytest.raises(ValueError, match="structure"):
        serving(renamed, batch)


def test_export_rejects_masks_plus_keypoints(tiny_eval_setup, tmp_path):
    cfg, model, variables, batch, ref = tiny_eval_setup
    with pytest.raises(ValueError, match="mutually exclusive"):
        export_serving(cfg, model, variables, str(tmp_path / "x.pkl"),
                       with_masks=True, with_keypoints=True)


def test_serving_is_weight_agnostic(tiny_eval_setup, tmp_path):
    """One artifact serves any checkpoint of the architecture: calling with
    perturbed weights changes the result (weights are not baked in)."""
    cfg, model, variables, batch, ref = tiny_eval_setup
    path = str(tmp_path / "serving_wa.pkl")
    export_serving(cfg, model, variables, path, fmt="aot")
    serving = load_serving(path)

    bumped = jax.tree.map(lambda x: x + 0.05 if x.dtype == jnp.float32 else x,
                          variables)
    out_ref = serving(variables, batch)
    out_bumped = serving(bumped, batch)
    same = all(np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.tree.leaves(out_ref),
                               jax.tree.leaves(out_bumped)))
    assert not same


def test_uint8_export_matches_float_path(tiny_eval_setup, tmp_path):
    """A uint8-input export (raw-pixel server: 1 byte/pixel on the wire,
    normalization inside the exported program) must produce the same
    detections as the f32 jit on the equivalent normalized canvas."""
    cfg, model, variables, _batch, _ref = tiny_eval_setup
    rng = np.random.RandomState(1)
    spec = batch_spec(cfg, 1, jnp.uint8)
    raw = rng.randint(0, 256, spec.images.shape, dtype=np.uint8)
    u8_batch = ImageBatch(
        images=jnp.asarray(raw),
        sizes=jnp.asarray([[64, 96]], jnp.int32),
        orig_sizes=jnp.asarray([[64, 96]], jnp.int32),
        is_source=jnp.ones((1,), bool))
    # the f32 reference input: the exact canvas the device-side normalize
    # produces (full-size image -> no padding mask effect)
    mean = np.asarray(cfg.INPUT.PIXEL_MEAN, np.float32)
    f32_batch = ImageBatch(
        images=jnp.asarray(raw.astype(np.float32) - mean),
        sizes=u8_batch.sizes, orig_sizes=u8_batch.orig_sizes,
        is_source=u8_batch.is_source)
    ref = jax.jit(lambda v, b: model.apply(v, b))(variables, f32_batch)

    path = str(tmp_path / "serving_u8.pkl")
    export_serving(cfg, model, variables, path, fmt="stablehlo",
                   image_dtype=jnp.uint8)
    serving = load_serving(path)
    out = serving(variables, u8_batch)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
