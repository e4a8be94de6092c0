"""Prepped-canvas staging cache: decode a training image ONCE.

Detection training revisits the same few-thousand images every epoch, and on
a small bench host the PNG decode + resize/normalize/pad dominates the step
(BENCH_r04: loader-fed 4.9 img/s vs 46.8 device-resident — ~90% of the step
was host prep on a 1-core VM). The reference pays this cost every epoch
through its torch DataLoader workers (reference data/build.py:232-420 +
engine/trainer.py:199 ``data_time``); on a many-core GPU host that hides it,
on a TPU host-feed it is the bottleneck.

This cache persists the POST-PREP canvas (resized + flipped + normalized +
padded, the exact array ``_SampleProcessor`` would produce) to disk, keyed
by the image file identity and every parameter that affects the pixels.
Epochs >= 2 skip decode and prep entirely: a hit is one page-cached read.
With flip_prob 0.5 each image has at most two variants (hflip x the drawn
min_size), so the cache converges after ~2 epochs.

Storage is one ``.npy`` per (image, geometry) under the cache root, written
atomically (tmp + ``os.replace``) so concurrent workers/processes can share
a cache directory; a torn or corrupt file reads as a miss and is rewritten.
Default dtype is float32 — hits are BIT-EXACT with the cold decode path.
``float16`` halves the bytes: canvas values are (BGR255 - mean) with
magnitude <= ~255, where f16 rounding error (<= 0.0625) is strictly below
the bf16 compute rounding the model applies anyway (TPU.COMPUTE_DTYPE).
Both modes are pinned by tests/test_loader.py.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from typing import Optional

import numpy as np

_FORMAT_VERSION = 1


def default_stage_dir() -> str:
    """Shared per-host default (keys include file identity, so sharing a
    directory across runs/datasets is safe and warms faster)."""
    return os.path.join(tempfile.gettempdir(), "da_detect_stage")


class StageCache:
    """Disk-backed prepped-canvas cache.

    ``dtype``: storage dtype ("float16" default, "float32" for exactness).
    ``get``/``put`` never raise on I/O problems — a broken cache must only
    ever cost a re-decode, not a training run.
    """

    def __init__(self, root: str, dtype: str = "float32"):
        self.root = root
        self.dtype = np.dtype(dtype)
        os.makedirs(root, exist_ok=True)
        self.hits = 0
        self.misses = 0

    def _path(self, image_path: str, key_parts: tuple) -> str:
        try:
            st = os.stat(image_path)
            ident = (image_path, st.st_mtime_ns, st.st_size)
        except OSError:
            ident = (image_path,)
        raw = repr((_FORMAT_VERSION, ident, key_parts, self.dtype.str))
        h = hashlib.sha1(raw.encode()).hexdigest()
        return os.path.join(self.root, h[:2], h + ".npy")

    def has(self, image_path: str, key_parts: tuple) -> bool:
        return os.path.exists(self._path(image_path, key_parts))

    def get(self, image_path: str, key_parts: tuple) -> Optional[np.ndarray]:
        """Return the float32 canvas on a hit, else None."""
        p = self._path(image_path, key_parts)
        try:
            arr = np.load(p, mmap_mode="r")
            # materialize an OWNED copy (asarray would alias the memmap and
            # pin its file descriptor); pages are OS-cached after epoch 2 so
            # this is a memcpy. uint8 canvases (TPU.TRANSPORT_PIXELS) stay
            # uint8 — they are normalized on device; float storage returns
            # the f32 canvas (f16 upcast on read).
            if arr.dtype == np.uint8:
                out = np.array(arr, copy=True)
            else:
                out = np.array(arr, np.float32, copy=True)
            self.hits += 1
            return out
        except (OSError, ValueError, EOFError):
            self.misses += 1
            return None

    def put(self, image_path: str, key_parts: tuple,
            canvas: np.ndarray) -> None:
        p = self._path(image_path, key_parts)
        try:
            os.makedirs(os.path.dirname(p), exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=os.path.dirname(p),
                                       suffix=".tmp")
            try:
                with os.fdopen(fd, "wb") as f:
                    np.save(f, canvas.astype(self.dtype, copy=False))
                os.replace(tmp, p)
            except BaseException:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
                raise
        except OSError:
            pass  # full/read-only disk: cache disabled for this entry


def make_stage_cache(cfg) -> Optional[StageCache]:
    """Build the cache from config (``DATALOADER.STAGE_CACHE`` /
    ``STAGE_DIR`` / ``STAGE_DTYPE``); None when disabled."""
    if not cfg.DATALOADER.STAGE_CACHE:
        return None
    root = cfg.DATALOADER.STAGE_DIR or default_stage_dir()
    try:
        return StageCache(root, cfg.DATALOADER.STAGE_DTYPE)
    except OSError:
        return None
