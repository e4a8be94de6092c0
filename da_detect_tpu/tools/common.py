"""Shared CLI plumbing for the tools (reference tools/train_net*.py:256-347
argument handling, seeding, logging, distributed init)."""

from __future__ import annotations

import argparse
import logging
import os

import jax
import numpy as np

from ..config import get_cfg
from ..utils.logging_utils import collect_env_info, setup_logger


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--config-file", default="", metavar="FILE")
    p.add_argument("--skip-test", action="store_true")
    p.add_argument("--use-tensorboard", action="store_true")
    p.add_argument("--profile", default="",
                   help="directory to write a jax.profiler trace of iterations 10-20")
    p.add_argument("--seed", type=int, default=100)  # reference setup_seed(100)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    return p


def setup(args, logger_name: str):
    """cfg merge + multi-host init + logging. Returns (cfg, logger)."""
    from ..utils.env import setup_environment
    setup_environment()
    # multi-host rendezvous (replaces torch.distributed NCCL env init,
    # reference train_net_triplet.py:301-309)
    if "JAX_COORDINATOR_ADDRESS" in os.environ or "MEGASCALE_COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    output_dir = os.path.join(cfg.MODEL.OUTPUT_DIR, cfg.MODEL.OUTPUT_SAVE_NAME)
    cfg.MODEL.OUTPUT_DIR = output_dir
    cfg.freeze()

    if cfg.PATHS_CATALOG and os.path.exists(cfg.PATHS_CATALOG):
        from ..config.catalog import load_user_catalog
        load_user_catalog(cfg.PATHS_CATALOG)

    if jax.process_index() == 0:
        os.makedirs(output_dir, exist_ok=True)
    # configure the package root so engine/data/eval module logs surface too
    setup_logger("da_detect_tpu", output_dir, jax.process_index())
    logger = logging.getLogger(logger_name)
    logger.info("using %d devices / %d processes", jax.device_count(),
                jax.process_count())
    if args.config_file:
        logger.info("loaded configuration file %s", args.config_file)
    logger.info("environment:\n%s", collect_env_info())
    np.random.seed(args.seed)
    return cfg, logger
