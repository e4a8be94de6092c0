"""Build a model from every yaml in our configs/ zoo (reference
tests/test_detectors.py: construct every config, shapes only via eval_shape
to keep it fast)."""

import glob
import os

import jax
import jax.numpy as jnp
import pytest

from da_detect_tpu.config import get_cfg
from da_detect_tpu.models import build_detection_model
from da_detect_tpu.structures.image_batch import ImageBatch

ZOO = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                    "configs", "**", "*.yaml"),
                       recursive=True))


@pytest.mark.parametrize("path", ZOO, ids=lambda p: os.path.basename(p))
def test_zoo_config_builds_model(path):
    cfg = get_cfg()
    cfg.merge_from_file(path)
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_detection_model(cfg)
    batch = ImageBatch(images=jnp.zeros((1, 64, 64, 3)),
                       sizes=jnp.asarray([[64, 64]], jnp.int32),
                       orig_sizes=jnp.asarray([[64, 64]], jnp.int32),
                       is_source=jnp.ones((1,), bool))
    shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, batch))
    assert "params" in shapes
