"""End-to-end slice: triplet DA training on a synthetic aligned triple +
COCO-style eval — the quick-schedule integration tier (SURVEY §4)."""

import os

import jax
import numpy as np
import pytest

import tests.data_factory as factory
from da_detect_tpu.config import get_cfg
from da_detect_tpu.data import make_data_loader, make_data_loader_da
from da_detect_tpu.engine.inference import inference
from da_detect_tpu.engine.trainer import create_train_state, do_train
from da_detect_tpu.models import build_detection_model


@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("tiny_coco")
    dirs = factory.make_triplet_datasets(str(root))
    factory.register_tiny_catalog(dirs)
    return dirs


def tiny_train_cfg():
    cfg = get_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.IMAGE_SHAPE = (128, 160)
    cfg.TPU.MAX_GT_BOXES = 10
    cfg.MODEL.DOMAIN_ADAPTATION_ON = True
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 3
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 200
    cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN = 64
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 200
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 64
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.INPUT.MIN_SIZE_TRAIN = (120,)
    cfg.INPUT.MAX_SIZE_TRAIN = 160
    cfg.INPUT.MIN_SIZE_TEST = 120
    cfg.INPUT.MAX_SIZE_TEST = 160
    cfg.DATASETS.SOURCE_TRAIN = ("tiny_clean_cocostyle",)
    cfg.DATASETS.TARGET_TRAIN = ("tiny_foggy_cocostyle",)
    cfg.DATASETS.TARGET_TRAIN_negative = ("tiny_rainy_cocostyle",)
    cfg.DATASETS.TEST = ("tiny_foggy_cocostyle",)
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 3
    cfg.SOLVER.BASE_LR = 0.001
    cfg.TEST.IMS_PER_BATCH = 2
    cfg.TEST.DETECTIONS_PER_IMG = 10
    return cfg


def test_triplet_train_and_eval(tiny_data, tmp_path):
    cfg = tiny_train_cfg()
    model = build_detection_model(cfg)
    loader = make_data_loader_da(cfg, aligned=True, seed=0)
    it = iter(loader)
    sample = next(it)
    assert len(sample) == 6  # 3 domains x (batch, targets)
    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0), sample,
                                   "cosine")

    def chained():
        yield sample
        yield from it

    state = do_train(cfg, model, state, tx, chained(),
                     max_iter=cfg.SOLVER.MAX_ITER, log_period=1)
    assert int(state.step) == cfg.SOLVER.MAX_ITER
    loader.close()

    # eval path end-to-end incl. the from-scratch COCO evaluator
    test_loader, dataset = make_data_loader(
        cfg, is_train=False, dataset_names=cfg.DATASETS.TEST)
    variables = {"params": state.params, "frozen": state.frozen}
    results, predictions = inference(model, variables, test_loader, dataset,
                                     output_folder=str(tmp_path))
    assert "bbox" in results
    assert 0.0 <= results["bbox"]["AP50"] <= 1.0 or results["bbox"]["AP50"] == -1.0
    assert os.path.exists(tmp_path / "coco_results.json")
    assert len(predictions) == len(dataset)


def test_tta_eval(tiny_data, tmp_path):
    """TTA path: multi-scale + flip merge feeding the evaluator (the feature
    the reference left unwired)."""
    import jax.numpy as jnp
    from da_detect_tpu.engine.bbox_aug import compute_on_dataset_aug
    from da_detect_tpu.data.evaluation import evaluate

    cfg = tiny_train_cfg()
    cfg.TEST.BBOX_AUG.ENABLED = True
    cfg.TEST.BBOX_AUG.H_FLIP = True
    cfg.TEST.BBOX_AUG.SCALES = (100,)
    cfg.TEST.BBOX_AUG.MAX_SIZE = 140
    model = build_detection_model(cfg)
    loader, _ = make_data_loader(cfg, is_train=False,
                                 dataset_names=cfg.DATASETS.TEST)
    batch, _ = next(iter(loader))
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch)
    predictions, dataset = compute_on_dataset_aug(model, variables, cfg,
                                                  cfg.DATASETS.TEST[0])
    assert len(predictions) == len(dataset)
    res = evaluate(dataset, predictions, output_folder=str(tmp_path))
    assert "bbox" in res


def test_source_only_loader_and_train(tiny_data):
    cfg = tiny_train_cfg()
    cfg.MODEL.DOMAIN_ADAPTATION_ON = False
    cfg.DATASETS.TRAIN = ("tiny_clean_cocostyle",)
    cfg.SOLVER.MAX_ITER = 2
    model = build_detection_model(cfg)
    loader, _ = make_data_loader(cfg, is_train=True, seed=0)
    it = iter(loader)
    sample = next(it)
    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0), sample,
                                   "multistep")

    def chained():
        yield sample
        yield from it

    state = do_train(cfg, model, state, tx, chained(), max_iter=2, log_period=1)
    assert int(state.step) == 2
    loader.close()


def test_mask_rcnn_train_and_segm_eval(tiny_data, tmp_path):
    """MASK_ON end to end: polygon rasterization in the loader, mask loss in
    the step, mask inference + segm COCO evaluation."""
    cfg = tiny_train_cfg()
    cfg.MODEL.DOMAIN_ADAPTATION_ON = False
    cfg.MODEL.MASK_ON = True
    cfg.DATASETS.TRAIN = ("tiny_clean_cocostyle",)
    cfg.SOLVER.MAX_ITER = 2
    model = build_detection_model(cfg)
    loader, _ = make_data_loader(cfg, is_train=True, seed=0, with_masks=True)
    it = iter(loader)
    sample = next(it)
    assert sample[1].masks is not None
    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0), sample,
                                   "multistep")

    def chained():
        yield sample
        yield from it

    state = do_train(cfg, model, state, tx, chained(), max_iter=2, log_period=1)
    loader.close()

    test_loader, dataset = make_data_loader(
        cfg, is_train=False, dataset_names=cfg.DATASETS.TEST)
    variables = {"params": state.params, "frozen": state.frozen}
    results, predictions = inference(model, variables, test_loader, dataset,
                                     iou_types=("bbox", "segm"),
                                     output_folder=str(tmp_path))
    assert "segm" in results
    some = next(iter(predictions.values()))
    assert "mask_probs" in some


@pytest.mark.slow
def test_keypoint_rcnn_train_and_oks_eval(tiny_data, tmp_path):
    """KEYPOINT_ON end to end on the zoo keypoint config
    (e2e_keypoint_rcnn_R_50_FPN_1x.yaml): keypoint transforms in the loader,
    kp heatmap loss in the step, heatmap decode + OKS COCO evaluation
    (reference roi_heads/keypoint_head/inference.py)."""
    cfg = tiny_train_cfg()
    cfg.merge_from_file("configs/e2e_keypoint_rcnn_R_50_FPN_1x.yaml")
    cfg.MODEL.DOMAIN_ADAPTATION_ON = False
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 3
    cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT = 2
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 200
    cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN = 64
    cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TRAIN = 64
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 200
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 64
    cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 64
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.IMAGE_SHAPE = (128, 160)
    cfg.TPU.MAX_GT_BOXES = 10
    cfg.INPUT.MIN_SIZE_TRAIN = (120,)
    cfg.INPUT.MAX_SIZE_TRAIN = 160
    cfg.INPUT.MIN_SIZE_TEST = 120
    cfg.INPUT.MAX_SIZE_TEST = 160
    cfg.DATASETS.TRAIN = ("tiny_clean_cocostyle",)
    cfg.DATASETS.TEST = ("tiny_foggy_cocostyle",)
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 2
    cfg.TEST.IMS_PER_BATCH = 2
    cfg.TEST.DETECTIONS_PER_IMG = 10
    assert cfg.MODEL.KEYPOINT_ON

    model = build_detection_model(cfg)
    loader, _ = make_data_loader(cfg, is_train=True, seed=0,
                                 with_keypoints=True)
    it = iter(loader)
    sample = next(it)
    assert sample[1].keypoints is not None
    assert sample[1].keypoints.shape[-2:] == (17, 3)
    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0), sample,
                                   "multistep")

    def chained():
        yield sample
        yield from it

    state = do_train(cfg, model, state, tx, chained(), max_iter=2,
                     log_period=1)
    loader.close()

    test_loader, dataset = make_data_loader(
        cfg, is_train=False, dataset_names=cfg.DATASETS.TEST)
    variables = {"params": state.params, "frozen": state.frozen}
    results, predictions = inference(model, variables, test_loader, dataset,
                                     iou_types=("bbox", "keypoints"),
                                     output_folder=str(tmp_path))
    assert "keypoints" in results
    assert "AP" in results["keypoints"]
    some = next(iter(predictions.values()))
    assert "keypoints" in some and some["keypoints"].shape[-2:] == (17, 3)


@pytest.mark.slow
def test_da_ablation_direction(tmp_path):
    """The committed DA-direction gate (VERDICT r1 #7): under a strong
    synthetic domain shift, triplet-DA training must beat source-only on the
    target domain by a clear margin (the synthetic proxy of the reference's
    23.41 -> 42.34 ablation ladder, README.md:153-159 there; the adaptive
    margin mechanism itself is pinned in tests/test_da_margin.py).

    The shift is STRUCTURAL (channel-inverted target domain, see
    build_synthetic): an affine fog is mostly absorbed by the GN-normalized
    backbone (source-only kept AP50 0.61 under a=0.25 fog, leaving the gap
    thinner than trajectory chaos — it once flipped from 0.11 to 0.047 on a
    legitimate bias-schedule parity fix). Calibrated at 200 iters:
    source-only 0.013 vs DA 0.405 (gap 0.39); the 0.2 gate leaves ~2x
    headroom for chaotic trajectory jitter while staying 4x stronger than
    the old 0.05 gate."""
    from da_detect_tpu.tools import sanity_check

    # must not raise SystemExit: the tool gates internally on gap + margin
    sanity_check.main(["--ablation", "--iters", "200", "--min-gap", "0.2",
                       "--data-dir", str(tmp_path / "abl")])
