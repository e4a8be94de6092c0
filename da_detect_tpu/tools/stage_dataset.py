"""Offline dataset staging CLI.

Pre-decodes every (image, geometry) variant of the configured datasets into
the prepped-canvas staging cache (data/staging.py) so a subsequent training
or evaluation run starts fully warm — no PNG decode or resize/normalize on
the training critical path at all. The reference has no counterpart: its
torch DataLoader re-decodes every image every epoch
(reference data/build.py:232-420); on a TPU host-feed that decode is the
throughput bound (see PERFORMANCE.md, host-budget itemization).

Usage:
    python -m da_detect_tpu.tools.stage_dataset --config-file cfg.yaml \
        [--eval] [opts ...]
"""

from __future__ import annotations

import time

from ..data import prestage_datasets
from .common import base_parser, setup


def main(argv=None):
    p = base_parser("DA-Detect TPU offline dataset staging")
    p.add_argument("--eval", action="store_true",
                   help="stage the TEST datasets (eval geometry) instead of "
                        "the train/DA datasets")
    args = p.parse_args(argv)
    cfg, logger = setup(args, "da_detect_tpu.stage")
    if not cfg.DATALOADER.STAGE_CACHE:
        logger.warning("DATALOADER.STAGE_CACHE is off — nothing to do")
        return 0
    t0 = time.perf_counter()
    n = prestage_datasets(cfg, is_train=not args.eval)
    dt = time.perf_counter() - t0
    logger.info("staged %d canvases in %.1fs (%.1f ms each)", n, dt,
                1e3 * dt / max(n, 1))
    return n


if __name__ == "__main__":
    main()
