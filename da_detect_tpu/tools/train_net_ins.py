"""Instance-level-only DA ablation (reference tools/train_net-ins.py)."""

from __future__ import annotations

from .common import base_parser, setup
from .train_core import run_training


def main(argv=None):
    args = base_parser("DA ablation: instance-level alignment only").parse_args(argv)
    if args.opts is None:
        args.opts = []
    args.opts = ["MODEL.DA_HEADS.DA_IMG_LOSS_WEIGHT", "0.0",
                 "MODEL.DA_HEADS.DA_CST_LOSS_WEIGHT", "0.0"] + args.opts
    cfg, logger = setup(args, "da_detect_tpu.train_ins")
    run_training(cfg, logger, mode="da", schedule_kind="multistep",
                 skip_test=args.skip_test, use_tensorboard=args.use_tensorboard,
                 seed=args.seed, profile_dir=args.profile)


if __name__ == "__main__":
    main()
