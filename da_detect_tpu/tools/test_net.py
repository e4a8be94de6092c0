"""Evaluation CLI (reference tools/test_net.py)."""

from __future__ import annotations

import jax

from ..engine.trainer import create_train_state
from ..models import build_detection_model
from ..parallel import batch_sharding, make_mesh, shard_model
from ..utils.checkpoint import Checkpointer
from .common import base_parser, setup
from .train_core import run_eval


def main(argv=None):
    p = base_parser("DA-Detect TPU evaluation")
    p.add_argument("--ckpt", default="", help="checkpoint dir or weight file")
    args = p.parse_args(argv)
    cfg, logger = setup(args, "da_detect_tpu.test")

    mesh = make_mesh(cfg.TPU.MESH_DATA, spatial=cfg.TPU.MESH_SPATIAL,
                     model=cfg.TPU.MESH_MODEL)
    model = build_detection_model(cfg)

    # init variables from a dummy eval batch shape via the test loader
    from ..data import make_data_loader
    loader, dataset = make_data_loader(cfg, is_train=False,
                                       dataset_names=(cfg.DATASETS.TEST[0],))
    batch, _ = next(iter(loader))
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch)
    variables = dict(variables)

    weight = args.ckpt or cfg.MODEL.WEIGHT
    ckpt_dir = args.ckpt or cfg.MODEL.OUTPUT_DIR
    ck = Checkpointer(ckpt_dir, save_to_disk=False)
    if ck.has_checkpoint():
        import numpy as np
        template = {"params": jax.device_get(variables["params"]),
                    "frozen": jax.device_get(variables.get("frozen", {}))}
        # restore only model variables from the saved TrainState
        state, step = ck.resume_model(template)
        variables.update(state)
        logger.info("loaded checkpoint at iteration %d", step)
    elif weight:
        variables = Checkpointer.load_weight_file(
            weight, variables,
            pool_resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION)

    variables = shard_model(variables, mesh)  # replicate or channel-shard

    class _S:  # minimal state shim for run_eval
        params = variables["params"]
        frozen = variables.get("frozen", {})

    run_eval(cfg, logger, model, _S, batch_sharding(mesh))


if __name__ == "__main__":
    main()
