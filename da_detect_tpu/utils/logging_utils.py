"""Per-process logging setup (reference utils/logger.py:7-26) + env report
(utils/collect_env.py equivalent)."""

from __future__ import annotations

import logging
import os
import sys


def setup_logger(name: str, save_dir: str | None, rank: int = 0):
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    if logger.handlers:
        return logger
    fmt = logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s")
    if rank == 0:
        ch = logging.StreamHandler(stream=sys.stdout)
        ch.setLevel(logging.DEBUG)
        ch.setFormatter(fmt)
        logger.addHandler(ch)
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(save_dir, f"log_rank{rank}.txt"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def collect_env_info() -> str:
    import jax
    lines = [
        f"jax: {jax.__version__}",
        f"backend: {jax.default_backend()}",
        f"devices: {jax.devices()}",
        f"process_index: {jax.process_index()}/{jax.process_count()}",
    ]
    try:
        import flax
        import optax
        lines += [f"flax: {flax.__version__}", f"optax: {optax.__version__}"]
    except Exception:
        pass
    return "\n".join(lines)
