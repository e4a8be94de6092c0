"""Data loaders (reference data/build.py:232-420).

``make_data_loader`` — single-domain train/eval loader.
``make_data_loader_da`` — the aligned-triplet loader (Dataset_triplet +
BatchCollator_triplet, reference build.py:23-62): one index fetches the same
image from source/positive/negative datasets; positive/negative reuse the
*source* annotations with is_source=False (valid because the domains are
pixel-aligned renderings). Unlike the reference, identical geometric
transform parameters are applied across the triple (see transforms.py).

Batches are fixed-shape (ImageBatch, Targets) pytrees, produced on host
threads and prefetched to device. Aspect-ratio grouping
(reference GroupedBatchSampler) becomes a two-bucket canvas: landscape
batches use (H, W), portrait batches (W, H) — at most two XLA programs.
"""

from __future__ import annotations

import queue
import threading
import time
from collections import defaultdict
from concurrent.futures import ThreadPoolExecutor
from typing import Sequence

import jax
import numpy as np

from ..config.catalog import DatasetCatalog
from ..parallel import put_batch
from ..structures.image_batch import ImageBatch, Targets
from . import datasets as D
from .packing import BatchPacker
from .staging import make_stage_cache
from .transforms import (apply_geometry, canvas_for, compute_resize_hw,
                         load_image_bgr, normalize_and_pad,
                         rasterize_polygons, resize_flip_pad_u8,
                         transform_boxes)

try:  # fused native resize+normalize+pad (one pass; see native/src)
    from .. import native as _native
    _HAVE_NATIVE_PREP = _native.available()
except Exception:  # pragma: no cover
    _native = None
    _HAVE_NATIVE_PREP = False


def build_dataset(names: Sequence[str], is_train: bool, is_source: bool = True):
    ds = []
    for name in names:
        data = DatasetCatalog.get(name)
        factory = getattr(D, data["factory"])
        args = dict(data["args"])
        if data["factory"] == "COCODataset":
            args["remove_images_without_annotations"] = is_train
            args["is_source"] = is_source
        elif data["factory"] == "PascalVOCDataset":
            args["use_difficult"] = not is_train
        ds.append(factory(**args))
    if len(ds) == 1:
        return ds[0]
    return D.ConcatDataset(ds)


# COCO person-17 left/right swap for horizontal flips (reference
# structures/keypoint.py PersonKeypoints.FLIP_MAP)
_PERSON_KP_FLIP_INDS = (0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13,
                        16, 15)


class _SampleProcessor:
    def __init__(self, cfg, is_train: bool, with_masks: bool = False,
                 mask_resolution: int = 112, with_keypoints: bool = False):
        self.is_train = is_train
        # uint8 pixel transport (TPU.TRANSPORT_PIXELS): ship RAW resized
        # pixels (1 byte each) and normalize on device
        # (ImageBatch.normalized) — 4x fewer wire bytes than f32 canvases;
        # the host->device link is the loader-fed bottleneck on relayed
        # attachments (PERFORMANCE.md §Host input pipeline)
        self.transport_u8 = cfg.TPU.TRANSPORT_PIXELS == "uint8"
        # prepped-canvas staging cache (data/staging.py): decode each
        # (image, geometry) once, epochs >= 2 read the post-prep canvas
        self.stage = make_stage_cache(cfg)
        if self.stage is not None and self.transport_u8:
            self.stage.dtype = np.dtype(np.uint8)  # store raw pixels too
        # host-budget itemization (seconds, accumulated across workers;
        # read via loader.stats — PERFORMANCE.md quotes these per step)
        self.stats: dict[str, float] = defaultdict(float)
        self._stats_lock = threading.Lock()
        self.min_sizes = (tuple(cfg.INPUT.MIN_SIZE_TRAIN) if is_train
                          else (cfg.INPUT.MIN_SIZE_TEST,))
        self.max_size = (cfg.INPUT.MAX_SIZE_TRAIN if is_train
                         else cfg.INPUT.MAX_SIZE_TEST)
        self.flip_prob = 0.5 if is_train else 0.0
        self.pixel_mean = tuple(cfg.INPUT.PIXEL_MEAN)
        self.pixel_std = tuple(cfg.INPUT.PIXEL_STD)
        self.to_bgr255 = cfg.INPUT.TO_BGR255
        self.canvas = canvas_for(cfg, is_train)
        self.max_gt = cfg.TPU.MAX_GT_BOXES
        self.with_masks = with_masks
        self.mask_resolution = mask_resolution
        self.with_keypoints = with_keypoints
        self.num_keypoints = cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_CLASSES

    def draw_params(self, rng: np.random.RandomState):
        return dict(min_size=int(rng.choice(self.min_sizes)),
                    hflip=bool(rng.rand() < self.flip_prob))

    def canvas_hw(self, sample):
        if sample["height"] > sample["width"]:
            return (self.canvas[1], self.canvas[0]) if self.canvas[0] < self.canvas[1] \
                else self.canvas
        return self.canvas

    def _tick(self, key: str, t0: float):
        with self._stats_lock:
            self.stats[key] += time.perf_counter() - t0

    def _stage_key(self, params, canvas_hw) -> tuple:
        """Everything that affects the prepped pixels."""
        return (params["min_size"], self.max_size, bool(params["hflip"]),
                tuple(canvas_hw), self.pixel_mean, self.pixel_std,
                self.to_bgr255)

    def __call__(self, sample, params, canvas_hw):
        orig_boxes = sample["boxes"]
        stage_key = self._stage_key(params, canvas_hw)
        mh, mw = int(sample["height"]), int(sample["width"])
        img = None
        if self.stage is not None:
            t0 = time.perf_counter()
            img = self.stage.get(sample["path"], stage_key)
            self._tick("stage_read_s", t0)
            if img is not None:
                # hit: geometry from annotation metadata, no decode
                rh, rw = compute_resize_hw(mh, mw, params["min_size"],
                                           self.max_size)
                boxes = transform_boxes(sample["boxes"], mh, mw, rh, rw,
                                        params["hflip"])
        if img is None:
            t0 = time.perf_counter()
            raw = load_image_bgr(sample["path"])
            self._tick("decode_s", t0)
            h, w = raw.shape[:2]
            t0 = time.perf_counter()
            rh, rw = compute_resize_hw(h, w, params["min_size"],
                                       self.max_size)
            if self.transport_u8:
                boxes = transform_boxes(sample["boxes"], h, w, rh, rw,
                                        params["hflip"])
                img = resize_flip_pad_u8(raw, canvas_hw, rh, rw,
                                         params["hflip"])
            elif _HAVE_NATIVE_PREP:
                boxes = transform_boxes(sample["boxes"], h, w, rh, rw,
                                        params["hflip"])
                img = _native.prep_image(raw, canvas_hw, (rh, rw),
                                         self.pixel_mean, self.pixel_std,
                                         self.to_bgr255, params["hflip"])
            else:
                img, boxes, (rh, rw) = apply_geometry(
                    raw, sample["boxes"], min_size=params["min_size"],
                    max_size=self.max_size, hflip=params["hflip"])
                img = normalize_and_pad(img, canvas_hw, self.pixel_mean,
                                        self.to_bgr255, self.pixel_std)
            self._tick("prep_s", t0)
            # only stage when the file agrees with the annotation metadata
            # (hits derive geometry from metadata; a mismatching file must
            # never produce a canvas its hit path would mis-box)
            if self.stage is not None and (h, w) == (mh, mw):
                t0 = time.perf_counter()
                self.stage.put(sample["path"], stage_key, img)
                self._tick("stage_write_s", t0)
        g = self.max_gt
        n = min(len(boxes), g)
        pb = np.zeros((g, 4), np.float32)
        pl = np.zeros((g,), np.int32)
        pv = np.zeros((g,), bool)
        pb[:n] = boxes[:n]
        pl[:n] = sample["labels"][:n]
        pv[:n] = True
        out = dict(image=img, sizes=np.asarray([rh, rw], np.int32),
                   orig=np.asarray([sample["height"], sample["width"]], np.int32),
                   boxes=pb, labels=pl, valid=pv,
                   is_source=bool(sample["is_source"]),
                   image_id=sample["image_id"])
        if self.with_masks:
            # rasterize in the ORIGINAL gt-box frame (polygon coords are
            # original-image; box-frame masks are scale-invariant), then
            # mirror for the flip
            masks = np.zeros((g, self.mask_resolution, self.mask_resolution),
                             np.float32)
            for i in range(n):
                segs = sample["segmentations"][i]
                if segs and isinstance(segs, list):
                    m = rasterize_polygons(segs, orig_boxes[i],
                                           self.mask_resolution)
                    masks[i] = m[:, ::-1] if params["hflip"] else m
            out["masks"] = masks
        if self.with_keypoints:
            # resize-scale + legacy-flip keypoints, swapping left/right
            # semantic pairs (reference structures/keypoint.py transpose:
            # x -> width - x - 1, v==0 rows forced to 0)
            k = self.num_keypoints
            kps = np.zeros((g, k, 3), np.float32)
            # metadata dims, NOT the decode-path locals: on a stage-cache
            # hit no decode happened (puts are gated on file==metadata
            # dims, so these are identical on both paths)
            sx, sy = rw / max(mw, 1), rh / max(mh, 1)
            for i in range(n):
                raw = sample.get("keypoints", [None] * (i + 1))[i]
                if raw is None:
                    continue
                kp = np.asarray(raw, np.float32).reshape(-1, 3)[:k]
                kp[:, 0] *= sx
                kp[:, 1] *= sy
                if params["hflip"]:
                    kp[:, 0] = rw - kp[:, 0] - 1
                    if len(kp) == len(_PERSON_KP_FLIP_INDS):
                        kp = kp[list(_PERSON_KP_FLIP_INDS)]
                kp[kp[:, 2] == 0] = 0.0
                kps[i, :len(kp)] = kp
            out["keypoints"] = kps
        return out


def _stack(processed, with_masks, with_keypoints=False):
    batch = ImageBatch(
        images=np.stack([p["image"] for p in processed]),
        sizes=np.stack([p["sizes"] for p in processed]),
        orig_sizes=np.stack([p["orig"] for p in processed]),
        is_source=np.asarray([p["is_source"] for p in processed]),
    )
    targets = Targets(
        boxes=np.stack([p["boxes"] for p in processed]),
        labels=np.stack([p["labels"] for p in processed]),
        valid=np.stack([p["valid"] for p in processed]),
        masks=np.stack([p["masks"] for p in processed]) if with_masks else None,
        keypoints=(np.stack([p["keypoints"] for p in processed])
                   if with_keypoints else None),
    )
    return batch, targets


class _Prefetcher:
    """Background-thread batch producer (replaces DataLoader workers).

    Done-flag protocol (no in-band sentinel: a full queue at generator end
    would drop it); bounded puts so close() can always stop the producer and
    release the queued device buffers. ``pool`` (optional) is a decode
    worker pool owned by the loader; close() shuts it down.
    """

    def __init__(self, gen_fn, depth: int = 2,
                 pool: ThreadPoolExecutor | None = None, proc=None):
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = False
        self._done = False
        self._pool = pool
        self._proc = proc

        def run():
            try:
                for item in gen_fn():
                    if not self._put(item):
                        return
            finally:
                self._done = True

        self.t = threading.Thread(target=run, daemon=True)
        self.t.start()

    def _put(self, item) -> bool:
        while not self._stop:
            try:
                self.q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def __iter__(self):
        return self

    def __next__(self):
        while True:
            try:
                return self.q.get(timeout=0.2)
            except queue.Empty:
                if self._done and self.q.empty():
                    raise StopIteration
                if self._stop:
                    raise StopIteration

    @property
    def stats(self) -> dict:
        """Accumulated host-budget itemization (seconds per stage since the
        loader started, summed across workers): decode_s / prep_s /
        stage_read_s / stage_write_s / stack_s / pack_s / put_s, plus
        staging hit/miss counts. ``put_s`` times the device_put *dispatch*
        (the transfer itself overlaps the device step)."""
        if self._proc is None:
            return {}
        s = dict(self._proc.stats)
        if self._proc.stage is not None:
            s["stage_hits"] = self._proc.stage.hits
            s["stage_misses"] = self._proc.stage.misses
        return s

    def close(self):
        """Stop the producer and release queued (device) buffers."""
        self._stop = True
        while True:
            try:
                self.q.get_nowait()
            except queue.Empty:
                break
        self.t.join(timeout=2.0)
        if self._pool is not None:
            self._pool.shutdown(wait=False)


def _make_pool(cfg) -> ThreadPoolExecutor | None:
    """Decode/prep worker pool sized by DATALOADER.NUM_WORKERS (the
    reference's torch DataLoader worker count, reference defaults.py).
    cv2 decode and the native prep release the GIL, so threads scale the
    per-image work across host cores; 0/1 keeps the serial path."""
    n = int(cfg.DATALOADER.NUM_WORKERS)
    return ThreadPoolExecutor(max_workers=n) if n > 1 else None


def _run_jobs(pool, proc, jobs):
    """jobs: (sample_or_None, params, canvas) in deterministic order —
    params are drawn in the generator thread BEFORE submission, so worker
    scheduling cannot perturb the augmentation stream."""
    if pool is None:
        return [proc(s, p, c) if s is not None else None for s, p, c in jobs]
    return list(pool.map(
        lambda j: proc(j[0], j[1], j[2]) if j[0] is not None else None, jobs))


def _check_batch_sharding(batch_size: int, sharding, what: str) -> None:
    """The per-step batch must shard evenly over the data mesh (the
    reference asserts IMS_PER_BATCH % (2*num_gpus) == 0, build.py:241-246).
    Fail at loader build time with an actionable message instead of a
    device_put shape error inside the prefetch thread."""
    if sharding is None or not hasattr(sharding, "mesh"):
        return
    ndev = dict(sharding.mesh.shape).get("data", 1)
    if batch_size % ndev:
        raise ValueError(
            f"{what}={batch_size} is not divisible by the data-mesh size "
            f"{ndev}; raise the batch or shrink the mesh (TPU.MESH_DATA)")


def make_data_loader(cfg, *, is_train: bool, dataset_names=None,
                     is_source: bool = True, with_masks: bool = False,
                     with_keypoints: bool = False,
                     shuffle: bool | None = None, seed: int = 0,
                     infinite: bool | None = None, sharding=None,
                     hflip: bool = False, packed: bool = False):
    """Single-domain loader. Train: yields (ImageBatch, Targets);
    eval: yields (ImageBatch, image_ids). ``hflip`` forces a deterministic
    flip on every image (the TTA flip pass).

    ``packed`` (host-feed/no sharding): the batch crosses host->device as
    ONE transfer (see data/packing.py; on relayed chips the per-transfer
    round-trip otherwise dominates). Train yields
    (packed_buffer_on_device, BatchPacker); eval yields
    ((buf, packer, sizes_np, orig_sizes_np), image_ids) — the two size
    arrays stay on host for the prediction rescale."""
    if packed and sharding is not None:
        raise ValueError("packed transport is single-device host-feed only")
    if dataset_names is None:
        dataset_names = cfg.DATASETS.TRAIN if is_train else cfg.DATASETS.TEST
    dataset = build_dataset(dataset_names, is_train, is_source)
    proc = _SampleProcessor(cfg, is_train, with_masks,
                            with_keypoints=with_keypoints)
    if hflip:
        proc.flip_prob = 1.0
    batch_size = (cfg.SOLVER.IMS_PER_BATCH if is_train
                  else cfg.TEST.IMS_PER_BATCH)
    _check_batch_sharding(
        batch_size, sharding,
        "SOLVER.IMS_PER_BATCH" if is_train else "TEST.IMS_PER_BATCH")
    shuffle = is_train if shuffle is None else shuffle
    infinite = is_train if infinite is None else infinite
    n_proc = jax.process_count()
    p_idx = jax.process_index()

    def generate():
        rng = np.random.RandomState(seed + p_idx)
        epoch = 0
        while True:
            order = np.arange(len(dataset))
            if shuffle:
                ep_rng = np.random.RandomState(seed + epoch)
                ep_rng.shuffle(order)
            # per-process shard (reference DistributedSampler pad-to-even)
            order = order[p_idx::n_proc]
            if is_train:
                # aspect-ratio grouping: two orientation buckets
                buckets = {True: [], False: []}
                for idx in order:
                    info = dataset.get_img_info(int(idx))
                    portrait = info["height"] > info["width"]
                    buckets[portrait].append(int(idx))
                    if len(buckets[portrait]) == batch_size:
                        yield from _emit(buckets[portrait], portrait)
                        buckets[portrait] = []
                if not infinite:
                    for portrait, lst in buckets.items():
                        if lst:
                            yield from _emit(lst, portrait)
                    break
                epoch += 1
            else:
                # eval also buckets by orientation: a batch must share one
                # canvas (portrait canvases are the transposed bucket)
                by_orient = {True: [], False: []}
                for idx in order:
                    info = dataset.get_img_info(int(idx))
                    by_orient[info["height"] > info["width"]].append(int(idx))
                for lst in by_orient.values():
                    for i in range(0, len(lst), batch_size):
                        yield from _emit(lst[i:i + batch_size], None,
                                         pad_to=batch_size)
                break

    pool = _make_pool(cfg)

    def _emit(indices, portrait, pad_to=None):
        rng = np.random.RandomState(hash((seed, tuple(indices))) % (2 ** 31))
        jobs, ids = [], []
        for idx in indices:
            s = dataset.sample(idx)
            jobs.append((s, proc.draw_params(rng), proc.canvas_hw(s)))
            ids.append(s["image_id"])
        processed = _run_jobs(pool, proc, jobs)
        while pad_to and len(processed) < pad_to:
            processed.append(processed[-1])
            ids.append(None)
        t0 = time.perf_counter()
        batch, targets = _stack(processed, with_masks, with_keypoints)
        proc._tick("stack_s", t0)
        if packed:
            t0 = time.perf_counter()
            if is_train:
                packer = BatchPacker((batch, targets))
                buf = packer.pack((batch, targets))
            else:
                packer = BatchPacker(batch)
                buf = packer.pack(batch)
            proc._tick("pack_s", t0)
            t0 = time.perf_counter()
            dev = jax.device_put(buf)
            proc._tick("put_s", t0)
            with proc._stats_lock:
                proc.stats["batches"] += 1
            if is_train:
                yield dev, packer
            else:
                yield (dev, packer, batch.sizes, batch.orig_sizes), ids
            return
        t0 = time.perf_counter()
        batch = put_batch(batch, sharding)
        targets = put_batch(targets, sharding)
        proc._tick("put_s", t0)
        with proc._stats_lock:
            proc.stats["batches"] += 1
        if is_train:
            yield batch, targets
        else:
            yield batch, ids

    return _Prefetcher(generate, depth=cfg.TPU.PREFETCH, pool=pool,
                       proc=proc), dataset


def prestage_datasets(cfg, dataset_names=None, *, is_train: bool = True,
                      include_da: bool = True) -> int:
    """Offline staging: decode + prep every (image, geometry) variant of the
    configured datasets into the staging cache (data/staging.py) so training
    starts fully warm — the train-time equivalent of ahead-of-time
    compilation. With flip_prob 0.5 and a single MIN_SIZE_TRAIN there are
    two variants per image. Returns the number of canvases prepped (0 when
    ``DATALOADER.STAGE_CACHE`` is off). CLI: tools/stage_dataset.py."""
    proc = _SampleProcessor(cfg, is_train)
    if proc.stage is None:
        return 0
    roles: list[tuple] = []
    if dataset_names is not None:
        roles.append((tuple(dataset_names), True))
    elif not is_train:
        roles.append((tuple(cfg.DATASETS.TEST), True))
    else:
        if cfg.DATASETS.TRAIN:
            roles.append((tuple(cfg.DATASETS.TRAIN), True))
        if include_da and cfg.DATASETS.SOURCE_TRAIN:
            roles.append((tuple(cfg.DATASETS.SOURCE_TRAIN), True))
            roles.append((tuple(cfg.DATASETS.TARGET_TRAIN), False))
            if cfg.DATASETS.TARGET_TRAIN_negative:
                roles.append((tuple(cfg.DATASETS.TARGET_TRAIN_negative),
                              False))
    flips = (False, True) if proc.flip_prob > 0 else (False,)
    n = 0
    pool = _make_pool(cfg)
    try:
        for names, is_source in roles:
            dataset = build_dataset(names, is_train, is_source)
            jobs = []
            for idx in range(len(dataset)):
                s = dataset.sample(idx)
                canvas = proc.canvas_hw(s)
                for ms in proc.min_sizes:
                    for flip in flips:
                        params = dict(min_size=ms, hflip=flip)
                        # idempotent: already-staged variants (shared
                        # images across roles, reruns) are skipped
                        if proc.stage.has(s["path"],
                                          proc._stage_key(params, canvas)):
                            continue
                        jobs.append((s, params, canvas))
            _run_jobs(pool, proc, jobs)
            n += len(jobs)
    finally:
        if pool is not None:
            pool.shutdown(wait=False)
    return n


def make_data_loader_da(cfg, *, aligned: bool = True, seed: int = 0,
                        sharding=None, packed: bool = False):
    """Triplet loader: yields (batch_s, targets_s, batch_t, targets_t,
    batch_n, targets_n) with per-device batch k = IMS_PER_BATCH // 2
    (reference halves the batch for DA, build.py:241-246).

    ``packed`` (host-feed/no sharding only): yield (packed_buffer_on_device,
    BatchPacker) — the whole 6-pytree step input as ONE host->device
    transfer (data/packing.py)."""
    if packed and sharding is not None:
        raise ValueError("packed transport is single-device host-feed only")
    ds_s = build_dataset(cfg.DATASETS.SOURCE_TRAIN, True, True)
    ds_p = build_dataset(cfg.DATASETS.TARGET_TRAIN, True, False)
    ds_n = build_dataset(cfg.DATASETS.TARGET_TRAIN_negative, True, False) \
        if cfg.DATASETS.TARGET_TRAIN_negative else None
    proc = _SampleProcessor(cfg, True)
    k = max(cfg.SOLVER.IMS_PER_BATCH // 2, 1)
    _check_batch_sharding(k, sharding,
                          "IMS_PER_BATCH//2 (triples per step)")

    n = len(ds_s)
    if aligned:
        n = min(n, len(ds_p), *( [len(ds_n)] if ds_n else [] ))

    pool = _make_pool(cfg)

    def generate():
        epoch = 0
        while True:
            rng = np.random.RandomState(seed + epoch)
            order = rng.permutation(n)
            order = order[jax.process_index()::jax.process_count()]
            for i in range(0, len(order) - k + 1, k):
                jobs = []
                for idx in order[i:i + k]:
                    s = ds_s.sample(int(idx))
                    if aligned:
                        p = ds_p.sample(int(idx))
                        g = ds_n.sample(int(idx)) if ds_n else None
                    else:
                        p = ds_p.sample(int(rng.randint(len(ds_p))))
                        g = (ds_n.sample(int(rng.randint(len(ds_n))))
                             if ds_n else None)
                    # positive/negative reuse the source annotations
                    # (Dataset_triplet, reference build.py:40-47)
                    for other in (p, g):
                        if other is not None and aligned:
                            other["boxes"] = s["boxes"]
                            other["labels"] = s["labels"]
                            other["height"] = s["height"]
                            other["width"] = s["width"]
                    params = proc.draw_params(rng)  # shared geometry
                    canvas = proc.canvas_hw(s)
                    jobs += [(x, params, canvas) for x in (s, p, g)]
                results = _run_jobs(pool, proc, jobs)
                triples = [tuple(results[j:j + 3])
                           for j in range(0, len(results), 3)]
                out = []
                t0 = time.perf_counter()
                for d in range(3 if ds_n else 2):
                    items = [t[d] for t in triples]
                    if items[0] is None:
                        continue
                    b, tg = _stack(items, False)
                    if not packed:
                        b = put_batch(b, sharding)
                        tg = put_batch(tg, sharding)
                    out += [b, tg]
                proc._tick("stack_s" if packed else "stack_put_s", t0)
                if packed:
                    t0 = time.perf_counter()
                    packer = BatchPacker(tuple(out))
                    buf = packer.pack(tuple(out))
                    proc._tick("pack_s", t0)
                    t0 = time.perf_counter()
                    dev = jax.device_put(buf)
                    proc._tick("put_s", t0)
                    with proc._stats_lock:
                        proc.stats["batches"] += 1
                    yield dev, packer
                else:
                    with proc._stats_lock:
                        proc.stats["batches"] += 1
                    yield tuple(out)
            epoch += 1

    return _Prefetcher(generate, depth=cfg.TPU.PREFETCH, pool=pool,
                       proc=proc)
