"""Classic trainer (reference tools/train_net.py): source-only, or 2-domain
DA when MODEL.DOMAIN_ADAPTATION_ON. WarmupMultiStep schedule."""

from __future__ import annotations

from .common import base_parser, setup
from .train_core import run_training


def main(argv=None):
    args = base_parser("DA-Detect TPU training").parse_args(argv)
    cfg, logger = setup(args, "da_detect_tpu.train")
    mode = "da" if cfg.MODEL.DOMAIN_ADAPTATION_ON else "source_only"
    run_training(cfg, logger, mode=mode, schedule_kind="multistep",
                 skip_test=args.skip_test, use_tensorboard=args.use_tensorboard,
                 seed=args.seed, profile_dir=args.profile)


if __name__ == "__main__":
    main()
