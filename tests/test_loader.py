"""Loader behaviors: orientation bucketing (train + eval), padding of the
last eval batch, shared triplet geometry."""

import json
import os

import numpy as np
import pytest

try:
    import cv2
except Exception:
    cv2 = None

from da_detect_tpu.config import get_cfg
from da_detect_tpu.data import make_data_loader
from da_detect_tpu.data.datasets import COCODataset


@pytest.fixture(scope="module")
def mixed_orientation_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("mixed")
    img_dir = root / "imgs"
    img_dir.mkdir()
    images, annotations = [], []
    sizes = [(80, 120), (120, 80), (80, 120), (120, 80), (80, 120)]
    for i, (h, w) in enumerate(sizes):
        img = np.full((h, w, 3), 30, np.uint8)
        img[10:40, 10:40] = (200, 50, 50)
        cv2.imwrite(str(img_dir / f"im_{i}.png"), img)
        images.append({"id": i + 1, "file_name": f"im_{i}.png",
                       "height": h, "width": w})
        annotations.append({"id": i + 1, "image_id": i + 1, "category_id": 1,
                            "bbox": [10, 10, 30, 30], "area": 900,
                            "iscrowd": 0, "segmentation": []})
    ann = root / "ann.json"
    ann.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": 1, "name": "thing"}]}))
    (root / "catalog.json").write_text(json.dumps({
        "mixed_cocostyle": {"img_dir": "imgs", "ann_file": "ann.json"}}))
    os.environ["DA_DETECT_DATA_DIR"] = str(root)
    return str(root)


def _cfg():
    cfg = get_cfg()
    cfg.TPU.IMAGE_SHAPE = (0, 0)
    cfg.TPU.MAX_GT_BOXES = 5
    cfg.INPUT.MIN_SIZE_TRAIN = (60,)
    cfg.INPUT.MAX_SIZE_TRAIN = 96
    cfg.INPUT.MIN_SIZE_TEST = 60
    cfg.INPUT.MAX_SIZE_TEST = 96
    cfg.DATALOADER.SIZE_DIVISIBILITY = 32
    cfg.TEST.IMS_PER_BATCH = 2
    cfg.SOLVER.IMS_PER_BATCH = 2
    return cfg


def test_eval_batches_are_orientation_pure(mixed_orientation_data):
    cfg = _cfg()
    loader, dataset = make_data_loader(cfg, is_train=False,
                                       dataset_names=("mixed_cocostyle",))
    seen_ids = []
    shapes = set()
    for batch, ids in loader:
        shapes.add(batch.images.shape[1:3])
        seen_ids += [i for i in ids if i is not None]
    # every image evaluated exactly once despite mixed orientations
    assert sorted(seen_ids) == [1, 2, 3, 4, 5]
    # two canvas shapes, transposes of each other
    assert len(shapes) == 2
    (a, b) = sorted(shapes)
    assert a == tuple(reversed(b))


def test_train_batches_are_orientation_pure(mixed_orientation_data):
    cfg = _cfg()
    loader, _ = make_data_loader(cfg, is_train=True,
                                 dataset_names=("mixed_cocostyle",), seed=0)
    it = iter(loader)
    for _ in range(6):
        batch, targets = next(it)
        h, w = batch.images.shape[1:3]
        assert (h, w) in ((64, 96), (96, 64))
        assert batch.images.shape[0] == 2
    loader.close()


def test_list_dataset_wraps_paths(tmp_path):
    # reference data/datasets/list_dataset.py:11-36 — dummy whole-image box
    from PIL import Image

    from da_detect_tpu.data.datasets import AbstractDataset, ListDataset
    from da_detect_tpu.data.datasets.base import SAMPLE_FIELDS

    paths = []
    for i, (h, w) in enumerate([(40, 60), (60, 40)]):
        p = tmp_path / f"raw_{i}.png"
        Image.fromarray(np.full((h, w, 3), 90, np.uint8)).save(p)
        paths.append(str(p))

    ds = ListDataset(paths)
    assert isinstance(ds, AbstractDataset)
    assert len(ds) == 2
    assert ds.get_img_info(0)["width"] == 60
    s = ds.sample(1)
    for f in SAMPLE_FIELDS:
        assert f in s
    np.testing.assert_allclose(s["boxes"], [[0, 0, 40, 60]])
    assert s["labels"].shape == (1,) and s["is_source"]


def test_abstract_dataset_init_maps():
    # reference data/datasets/abstract.py:38-60 — background pinned at 0
    from da_detect_tpu.data.datasets import AbstractDataset

    class Tiny(AbstractDataset):
        CLASSES = ("__background__", "car", "person")

    d = Tiny()
    d.init_maps()
    assert d.name_to_id["__background__"] == 0
    assert d.id_to_name[2] == "person"

    class Bad(AbstractDataset):
        CLASSES = ("car",)

    with pytest.raises(AssertionError):
        Bad().init_maps()


def test_list_dataset_drives_coco_demo(tmp_path):
    """ListDataset as a label-free inference source feeding COCODemo
    (the reference pairs list_dataset.py with demo/predictor.py for
    folder-of-images inference): every path the dataset yields runs
    through run_on_opencv_image end-to-end."""
    from PIL import Image

    from da_detect_tpu.data.datasets import ListDataset
    from da_detect_tpu.demo.predictor import COCODemo

    rng = np.random.RandomState(3)
    paths = []
    for i, (h, w) in enumerate([(50, 70), (70, 50)]):
        p = tmp_path / f"frame_{i}.png"
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(p)
        paths.append(str(p))
    ds = ListDataset(paths)

    cfg = get_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.IMAGE_SHAPE = (64, 96)
    cfg.INPUT.MIN_SIZE_TEST = 60
    cfg.INPUT.MAX_SIZE_TEST = 96
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 100
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 20
    demo = COCODemo(cfg, confidence_threshold=0.0)
    for i in range(len(ds)):
        s = ds.sample(i)
        with Image.open(s["path"]) as im:
            bgr = np.asarray(im.convert("RGB"))[:, :, ::-1].copy()
        assert bgr.shape[:2] == (s["height"], s["width"])
        out = demo.run_on_opencv_image(bgr)
        assert out.shape == bgr.shape and out.dtype == np.uint8


# ---------------------------------------------------------------------------
# Prepped-canvas staging cache (data/staging.py)
# ---------------------------------------------------------------------------

def _epoch_batches(cfg, seed=0):
    loader, _ = make_data_loader(cfg, is_train=True,
                                 dataset_names=("mixed_cocostyle",),
                                 seed=seed, infinite=False)
    out = [(np.asarray(b.images), np.asarray(t.boxes), np.asarray(t.labels))
           for b, t in loader]
    stats = loader.stats
    loader.close()
    return out, stats


def test_stage_cache_warm_epoch_bit_exact(mixed_orientation_data, tmp_path):
    """float32 staging (the default): a warm epoch's batches are
    bit-identical to the cold epoch's, decode is skipped on every hit."""
    cfg = _cfg()
    cfg.DATALOADER.STAGE_DIR = str(tmp_path / "stage")
    cold, s_cold = _epoch_batches(cfg)
    assert s_cold["stage_hits"] == 0 and s_cold["stage_misses"] > 0
    warm, s_warm = _epoch_batches(cfg)
    assert s_warm["stage_misses"] == 0 and s_warm["stage_hits"] > 0
    assert "decode_s" not in s_warm  # no image was decoded
    assert len(cold) == len(warm)
    for (ci, cb, cl), (wi, wb, wl) in zip(cold, warm):
        np.testing.assert_array_equal(ci, wi)
        np.testing.assert_array_equal(cb, wb)
        np.testing.assert_array_equal(cl, wl)


def test_stage_cache_f16_within_compute_rounding(mixed_orientation_data,
                                                 tmp_path):
    """float16 staging: warm canvases match cold within the documented
    bound (0.0625 absolute on BGR255-mean values), boxes exactly."""
    cfg = _cfg()
    cfg.DATALOADER.STAGE_DIR = str(tmp_path / "stage16")
    cfg.DATALOADER.STAGE_DTYPE = "float16"
    cold, _ = _epoch_batches(cfg)
    warm, s_warm = _epoch_batches(cfg)
    assert s_warm["stage_misses"] == 0
    for (ci, cb, _), (wi, wb, _) in zip(cold, warm):
        np.testing.assert_allclose(wi, ci, atol=0.0625, rtol=0)
        np.testing.assert_array_equal(cb, wb)


def test_stage_cache_keys_on_geometry(mixed_orientation_data, tmp_path):
    """The cache must never serve a flipped canvas for an unflipped draw:
    force-flip and no-flip epochs over the same staged directory both
    reproduce their own cold results."""
    cfg = _cfg()
    cfg.DATALOADER.STAGE_DIR = str(tmp_path / "stage_geo")

    def epoch(flip):
        loader, _ = make_data_loader(cfg, is_train=True,
                                     dataset_names=("mixed_cocostyle",),
                                     seed=0, infinite=False, hflip=flip)
        out = [(np.asarray(b.images), np.asarray(t.boxes)) for b, t in loader]
        loader.close()
        return out

    cold_noflip = epoch(False)
    cold_flip = epoch(True)
    warm_noflip = epoch(False)
    warm_flip = epoch(True)
    for cold, warm in ((cold_noflip, warm_noflip), (cold_flip, warm_flip)):
        for (ci, cb), (wi, wb) in zip(cold, warm):
            np.testing.assert_array_equal(ci, wi)
            np.testing.assert_array_equal(cb, wb)
    # and the two geometries genuinely differ
    assert not np.array_equal(cold_noflip[0][0], cold_flip[0][0])


def test_stage_cache_corrupt_entry_is_a_miss(mixed_orientation_data,
                                             tmp_path):
    """A torn/corrupt cache file must cost a re-decode, never an error or
    a wrong batch."""
    import glob
    cfg = _cfg()
    stage = str(tmp_path / "stage_bad")
    cfg.DATALOADER.STAGE_DIR = stage
    cold, _ = _epoch_batches(cfg)
    files = glob.glob(os.path.join(stage, "*", "*.npy"))
    assert files
    for f in files[:2]:
        with open(f, "wb") as fh:
            fh.write(b"\x93NUMPY garbage")
    warm, s = _epoch_batches(cfg)
    assert s["stage_misses"] > 0  # the corrupt entries fell back
    for (ci, cb, _), (wi, wb, _) in zip(cold, warm):
        np.testing.assert_array_equal(ci, wi)


def test_stage_cache_disabled_keeps_decoding(mixed_orientation_data,
                                             tmp_path):
    cfg = _cfg()
    cfg.DATALOADER.STAGE_CACHE = False
    _, s1 = _epoch_batches(cfg)
    _, s2 = _epoch_batches(cfg)
    assert "stage_hits" not in s2 and s2["decode_s"] > 0


def test_uint8_transport_matches_f32_prep_within_rounding(
        mixed_orientation_data):
    """TPU.TRANSPORT_PIXELS uint8 ships raw pixels and normalizes on device
    (ImageBatch.normalized). Under a REAL resize the only difference vs the
    reference-exact f32 host prep is cv2's uint8 fixed-point bilinear
    rounding — pin the documented bound (~1 unit on the BGR255 scale,
    below bf16 input rounding at pixel magnitudes) and that boxes/geometry
    are identical."""
    import jax.numpy as jnp

    from da_detect_tpu.structures.image_batch import ImageBatch

    outs = {}
    for mode in ("uint8", "float32"):
        cfg = _cfg()
        cfg.TPU.TRANSPORT_PIXELS = mode
        cfg.DATALOADER.STAGE_CACHE = False
        loader, _ = make_data_loader(cfg, is_train=True,
                                     dataset_names=("mixed_cocostyle",),
                                     seed=0, infinite=False)
        outs[mode] = [(np.asarray(b.images), np.asarray(b.sizes),
                       np.asarray(t.boxes)) for b, t in loader]
        loader.close()
        pix = cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD, cfg.INPUT.TO_BGR255

    assert len(outs["uint8"]) == len(outs["float32"])
    mean, std, bgr = pix
    for (iu, su, bu), (i32, s32, b32) in zip(outs["uint8"], outs["float32"]):
        assert iu.dtype == np.uint8 and i32.dtype == np.float32
        np.testing.assert_array_equal(su, s32)
        np.testing.assert_array_equal(bu, b32)
        batch = ImageBatch(images=jnp.asarray(iu), sizes=jnp.asarray(su),
                           orig_sizes=jnp.asarray(su),
                           is_source=jnp.ones((iu.shape[0],), bool))
        norm = np.asarray(batch.normalized(mean, std, bgr))
        assert norm.dtype == np.float32
        np.testing.assert_allclose(norm, i32, atol=1.0, rtol=0)
        # and it is genuinely the same image, not coincidentally close
        assert np.abs(norm - i32).mean() < 0.3
