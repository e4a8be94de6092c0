"""Single-transfer batch transport (data/packing.py): exact pack/unpack
round-trip, loader equivalence, packed-vs-unpacked train step equality, and
decode-worker-pool determinism.

Why it exists: on relayed TPU attachments each host->device transfer pays a
fixed round-trip (~23 ms measured on the bench chip); a triplet step's ~21
input leaves cost ~0.5 s of transport against a 64 ms device step. The
packed transport ships the whole step input as ONE raw-byte buffer; these
tests pin that it is bit-exact and leaves training semantics untouched (the
reference streams per-tensor ``.to(device)`` in its loop — triplet path,
reference engine/trainer.py:215-216).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import data_factory as factory
from da_detect_tpu.data import make_data_loader, make_data_loader_da
from da_detect_tpu.data.packing import BatchPacker
from da_detect_tpu.engine.trainer import create_train_state, make_train_step
from da_detect_tpu.models import build_detection_model

from test_end_to_end import tiny_train_cfg
from test_model_build import make_batch, tiny_cfg


@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("pack_coco")
    dirs = factory.make_triplet_datasets(str(root))
    factory.register_tiny_catalog(dirs)
    return dirs


def test_pack_roundtrip_exact_mixed_dtypes():
    rng = np.random.RandomState(0)
    tree = {
        "f32": rng.randn(3, 5, 2).astype(np.float32),
        "u8": rng.randint(0, 256, (5, 7, 3), dtype=np.uint8),
        "i32": rng.randint(-(1 << 30), 1 << 30, (7,), dtype=np.int32),
        "bool": rng.rand(4, 4) > 0.5,
        "nested": (rng.randn(2, 2).astype(np.float32),
                   np.asarray([1, 0, (1 << 24) + 1, -(1 << 28)], np.int32)),
    }
    packer = BatchPacker(tree)
    buf = packer.pack(tree)
    # raw-byte transport: a uint8 pixel leaf costs 1 byte on the wire, and
    # big/negative i32 values round-trip bit-exactly (no f32 range caveat)
    assert buf.dtype == np.uint8 and buf.ndim == 1
    out = packer.unpack_np(buf)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b)
                 or (a.dtype == b.dtype or pytest.fail(f"{a.dtype}!={b.dtype}")),
                 tree, out)
    # device-side unpack agrees too
    out_dev = jax.jit(packer.unpack)(jnp.asarray(buf))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
                 tree, out_dev)


def test_pack_rejects_shape_and_dtype_drift():
    packer2 = BatchPacker({"x": np.zeros((2, 3), np.float32)})
    with pytest.raises(ValueError, match="shape"):
        packer2.pack({"x": np.zeros((3, 2), np.float32)})
    with pytest.raises(ValueError, match="dtype"):
        packer2.pack({"x": np.zeros((2, 3), np.float64)})


def test_packer_static_identity():
    """Packers are static jit arguments: equal layout -> equal hash (shared
    trace); different layout (e.g. the portrait canvas bucket) -> unequal,
    so it can never be mis-sliced by a stale program."""
    a = {"x": np.zeros((2, 3), np.float32)}
    b = {"x": np.zeros((2, 3), np.float32)}
    c = {"x": np.zeros((3, 2), np.float32)}  # same size, different shape
    pa, pb, pc = BatchPacker(a), BatchPacker(b), BatchPacker(c)
    assert pa == pb and hash(pa) == hash(pb)
    assert pa != pc


def test_packed_triplet_loader_matches_unpacked(tiny_data):
    cfg = tiny_train_cfg()
    plain = make_data_loader_da(cfg, aligned=True, seed=0)
    packed = make_data_loader_da(cfg, aligned=True, seed=0, packed=True)
    it_p, it_k = iter(plain), iter(packed)
    for _ in range(3):
        ref = next(it_p)
        buf, packer = next(it_k)
        got = packer.unpack_np(np.asarray(jax.device_get(buf)))
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            ref, got)
    plain.close()
    packed.close()


def test_worker_pool_is_deterministic(tiny_data):
    """DATALOADER.NUM_WORKERS parallelizes decode+prep across host threads;
    augmentation params are drawn in the generator thread before submission,
    so the batch stream is bit-identical at any worker count."""
    cfg1 = tiny_train_cfg()
    cfg1.DATALOADER.NUM_WORKERS = 1
    cfg4 = tiny_train_cfg()
    cfg4.DATALOADER.NUM_WORKERS = 4
    l1 = make_data_loader_da(cfg1, aligned=True, seed=0)
    l4 = make_data_loader_da(cfg4, aligned=True, seed=0)
    it1, it4 = iter(l1), iter(l4)
    for _ in range(3):
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            next(it1), next(it4))
    l1.close()
    l4.close()

    # single-domain loader too
    s1, _ = make_data_loader(cfg1, is_train=True,
                             dataset_names=("tiny_clean_cocostyle",), seed=0)
    s4, _ = make_data_loader(cfg4, is_train=True,
                             dataset_names=("tiny_clean_cocostyle",), seed=0)
    it1, it4 = iter(s1), iter(s4)
    for _ in range(2):
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            next(it1), next(it4))
    s1.close()
    s4.close()


def test_packed_train_step_matches_unpacked():
    """The packed step (unpack-on-device prologue) produces the same losses
    and the same updated parameters as the plain step."""
    cfg = tiny_cfg()
    cfg.MODEL.DOMAIN_ADAPTATION_ON = True
    model = build_detection_model(cfg)
    bs, ts = make_batch(1, seed=0, is_source=True)
    bt, tt = make_batch(1, seed=1, is_source=False)
    bn, tn = make_batch(1, seed=2, is_source=False)
    sample = (bs, ts, bt, tt, bn, tn)
    np_sample = jax.tree.map(np.asarray, sample)
    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                   sample, "multistep")

    plain_step = make_train_step(model, tx, aligned=True, donate=False)
    packed_step = make_train_step(model, tx, aligned=True, donate=False,
                                  packed=True)
    packer = BatchPacker(np_sample)
    buf = jnp.asarray(packer.pack(np_sample))

    st_a, m_a = plain_step(state, *sample)
    st_b, m_b = packed_step(state, buf, packer)
    for k in m_a:
        np.testing.assert_allclose(float(m_a[k]), float(m_b[k]), rtol=1e-6,
                                   err_msg=k)
    leaves_a = jax.tree.leaves(st_a.params)
    leaves_b = jax.tree.leaves(st_b.params)
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-5,
                                   atol=1e-7)
