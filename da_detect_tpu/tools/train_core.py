"""Shared training driver used by the train_net* CLIs."""

from __future__ import annotations

import jax
import numpy as np

from ..data import make_data_loader, make_data_loader_da
from ..engine.inference import inference
from ..engine.trainer import create_train_state, do_train
from ..models import build_detection_model
from ..parallel import batch_sharding, make_mesh, shard_model
from ..utils.checkpoint import Checkpointer


def run_training(cfg, logger, *, mode: str, schedule_kind: str,
                 skip_test: bool = False, use_tensorboard: bool = False,
                 seed: int = 100, profile_dir: str | None = None):
    mesh = make_mesh(cfg.TPU.MESH_DATA, spatial=cfg.TPU.MESH_SPATIAL,
                     model=cfg.TPU.MESH_MODEL)
    sharding = batch_sharding(mesh)
    model = build_detection_model(cfg)

    # single-transfer transport (data/packing.py) on single-device host
    # feed: one device_put per step instead of one per input leaf
    packed = (bool(cfg.TPU.PACKED_TRANSPORT) and jax.device_count() == 1
              and jax.process_count() == 1)
    feed_sharding = None if packed else sharding

    if mode == "source_only":
        loader, _ = make_data_loader(cfg, is_train=True,
                                     sharding=feed_sharding,
                                     with_masks=cfg.MODEL.MASK_ON,
                                     with_keypoints=cfg.MODEL.KEYPOINT_ON,
                                     seed=seed, packed=packed)
        data_iter = iter(loader)
    else:
        aligned = cfg.MODEL.DA_HEADS.ALIGNMENT
        data_iter = iter(make_data_loader_da(cfg, aligned=aligned, seed=seed,
                                             sharding=feed_sharding,
                                             packed=packed))

    sample = next(data_iter)
    if packed:
        buf, packer = sample
        init_args = packer.unpack_np(np.asarray(jax.device_get(buf)))
    else:
        init_args = sample
    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(seed),
                                   init_args, schedule_kind)

    checkpointer = Checkpointer(cfg.MODEL.OUTPUT_DIR,
                                save_to_disk=jax.process_index() == 0)
    if checkpointer.has_checkpoint():
        host_state = jax.device_get(state)
        state, start_iter = checkpointer.resume(host_state)
    else:
        start_iter = 0
        if cfg.MODEL.WEIGHT:
            variables = {"params": jax.device_get(state.params),
                         "frozen": jax.device_get(state.frozen)}
            variables = Checkpointer.load_weight_file(
                cfg.MODEL.WEIGHT, variables,
                pool_resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION)
            state = state.replace(params=variables["params"],
                                  frozen=variables["frozen"])
            logger.info("loaded MODEL.WEIGHT %s", cfg.MODEL.WEIGHT)

    state = shard_model(state, mesh)  # replicate, or channel-shard over 'model'

    meters = None
    if use_tensorboard:
        from ..utils.metric_logger import TensorboardLogger
        meters = TensorboardLogger(cfg.TENSORBOARD_EXPERIMENT,
                                   start_iter=start_iter)

    eval_fn = None
    if cfg.MODEL.EVAL_USE_IN_TRAINING and cfg.DATASETS.TEST and not skip_test:
        def eval_fn(st, iteration):
            run_eval(cfg, logger, model, st, sharding)

    def chained(it):
        # the sample batch consumed for init is a real batch — train on it
        yield sample
        yield from it

    state = do_train(
        cfg, model, state, tx, chained(data_iter),
        max_iter=cfg.SOLVER.MAX_ITER, start_iter=start_iter,
        checkpointer=checkpointer,
        checkpoint_period=cfg.SOLVER.CHECKPOINT_PERIOD, meters=meters,
        aligned=(mode != "source_only" and cfg.MODEL.DA_HEADS.ALIGNMENT),
        eval_fn=eval_fn, profile_dir=profile_dir or None,
        test_period=cfg.SOLVER.TEST_PERIOD, packed=packed)

    if not skip_test and cfg.DATASETS.TEST:
        run_eval(cfg, logger, model, state, sharding)
    return state


def run_eval(cfg, logger, model, state, sharding=None):
    variables = {"params": state.params, "frozen": state.frozen}
    results = {}
    for name in cfg.DATASETS.TEST:
        if cfg.TEST.BBOX_AUG.ENABLED:
            from ..data.evaluation import evaluate
            from ..engine.bbox_aug import compute_on_dataset_aug
            logger.info("evaluating on %s with bbox TTA", name)
            predictions, dataset = compute_on_dataset_aug(
                model, variables, cfg, name, sharding)
            res = evaluate(dataset, predictions,
                           output_folder=cfg.MODEL.OUTPUT_DIR)
        else:
            # packed eval transport under the same conditions as training
            # (single transfer per batch; see data/packing.py) — a
            # single-device sharding is equivalent to host-feed, so packed
            # replaces it outright
            eval_packed = (bool(cfg.TPU.PACKED_TRANSPORT)
                           and jax.device_count() == 1
                           and jax.process_count() == 1)
            loader, dataset = make_data_loader(
                cfg, is_train=False, dataset_names=(name,),
                sharding=None if eval_packed else sharding,
                packed=eval_packed)
            logger.info("evaluating on %s (%d images)", name, len(dataset))
            iou_types = ("bbox",)
            if cfg.MODEL.MASK_ON:
                iou_types += ("segm",)
            if cfg.MODEL.KEYPOINT_ON:
                iou_types += ("keypoints",)
            res, _ = inference(
                model, variables, loader, dataset, iou_types=iou_types,
                output_folder=cfg.MODEL.OUTPUT_DIR,
                expected_results=cfg.TEST.EXPECTED_RESULTS,
                expected_results_sigma_tol=cfg.TEST.EXPECTED_RESULTS_SIGMA_TOL,
                style=cfg.TEST.EVAL_STYLE)
        results[name] = res
    return results
