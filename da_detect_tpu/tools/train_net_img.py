"""Image-level-only DA ablation (reference tools/train_net-img.py — identical
to train_net.py up to save paths; here expressed as weight overrides)."""

from __future__ import annotations

from .common import base_parser, setup
from .train_core import run_training


def main(argv=None):
    args = base_parser("DA ablation: image-level alignment only").parse_args(argv)
    if args.opts is None:
        args.opts = []
    args.opts = ["MODEL.DA_HEADS.DA_INS_LOSS_WEIGHT", "0.0",
                 "MODEL.DA_HEADS.DA_CST_LOSS_WEIGHT", "0.0"] + args.opts
    cfg, logger = setup(args, "da_detect_tpu.train_img")
    run_training(cfg, logger, mode="da", schedule_kind="multistep",
                 skip_test=args.skip_test, use_tensorboard=args.use_tensorboard,
                 seed=args.seed, profile_dir=args.profile)


if __name__ == "__main__":
    main()
