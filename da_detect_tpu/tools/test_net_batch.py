"""Batch evaluation over every checkpoint in a directory
(reference tools/test_net_batch.py — loops model_*.pth files)."""

from __future__ import annotations

import jax

from ..models import build_detection_model
from ..parallel import batch_sharding, make_mesh
from ..utils.checkpoint import Checkpointer
from .common import base_parser, setup
from .train_core import run_eval


def main(argv=None):
    p = base_parser("DA-Detect TPU batch evaluation")
    p.add_argument("--ckpt-dir", required=True)
    args = p.parse_args(argv)
    cfg, logger = setup(args, "da_detect_tpu.test_batch")

    mesh = make_mesh(cfg.TPU.MESH_DATA, spatial=cfg.TPU.MESH_SPATIAL,
                     model=cfg.TPU.MESH_MODEL)
    model = build_detection_model(cfg)
    from ..data import make_data_loader
    loader, _ = make_data_loader(cfg, is_train=False,
                                 dataset_names=(cfg.DATASETS.TEST[0],))
    batch, _ = next(iter(loader))
    variables = dict(model.init({"params": jax.random.PRNGKey(0)}, batch))

    ck = Checkpointer(args.ckpt_dir, save_to_disk=False)
    steps = sorted(ck._mgr.all_steps())
    logger.info("found %d checkpoints: %s", len(steps), steps)
    for step in steps:
        raw = ck._mgr.restore(step)
        get = (lambda o, k: o[k] if isinstance(o, dict) else getattr(o, k))
        variables["params"] = get(raw, "params")
        variables["frozen"] = get(raw, "frozen")

        class _S:
            params = variables["params"]
            frozen = variables["frozen"]

        logger.info("===== evaluating checkpoint %d =====", step)
        run_eval(cfg, logger, model, _S, batch_sharding(mesh))


if __name__ == "__main__":
    main()
