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


@pytest.mark.slow
def test_x101_dcn_triplet_da_train_step():
    """BASELINE config #5 (X-101-32x8d FPN + DCN + triplet DA) runs a REAL
    train step — the combination the reference advertises but cannot run
    (dcn keys absent from its defaults, deform ops unbound; SURVEY §7.4)."""
    import numpy as np
    import __graft_entry__ as entry
    from da_detect_tpu.engine.trainer import create_train_state, make_train_step

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..",
                                     "configs", "da_faster_rcnn",
                                     "e2e_triplet_da_faster_rcnn_X_101_32x8d_"
                                     "FPN_dcn_cityscapes_to_foggy_cityscapes"
                                     ".yaml"))
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.IMAGE_SHAPE = (64, 96)
    cfg.TPU.MAX_GT_BOXES = 8
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN = 16
    cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TRAIN = 16
    cfg.SOLVER.IMS_PER_BATCH = 2
    model = build_detection_model(cfg)
    sample = []
    for d, src in ((0, True), (1, False), (2, False)):
        b, t = entry._batch(cfg, 1, seed=d, is_source=src)
        sample += [b, t]
    sample = tuple(sample)
    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0), sample,
                                   "cosine")
    step = make_train_step(model, tx, aligned=False, donate=False)
    state, metrics = step(state, *sample)
    assert np.isfinite(float(metrics["loss_total"])), metrics
    assert "triplet_loss_image" in metrics  # TRIPLET_USE with img weight 1.0
    assert int(state.step) == 1
