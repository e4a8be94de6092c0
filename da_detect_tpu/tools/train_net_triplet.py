"""Triplet DA trainer (reference tools/train_net_triplet.py): the primary
entry for the WACV-23 method — cosine LR schedule, (source, positive,
negative) domain triples, adaptive-margin triplet regularization."""

from __future__ import annotations

from .common import base_parser, setup
from .train_core import run_training


def main(argv=None):
    args = base_parser("DA-Detect TPU triplet training").parse_args(argv)
    cfg, logger = setup(args, "da_detect_tpu.train_triplet")
    if not cfg.MODEL.DOMAIN_ADAPTATION_ON:
        logger.warning("DOMAIN_ADAPTATION_ON is False — training source-only")
        mode = "source_only"
    else:
        mode = ("da_triplet" if cfg.DATASETS.TARGET_TRAIN_negative else "da")
    logger.info("cosine annealing is chosen for lr scheduler")
    run_training(cfg, logger, mode=mode, schedule_kind="cosine",
                 skip_test=args.skip_test, use_tensorboard=args.use_tensorboard,
                 seed=args.seed, profile_dir=args.profile)


if __name__ == "__main__":
    main()
