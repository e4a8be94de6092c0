"""Multi-host seams: per-process loader sharding and the cross-process eval
merge (reference DistributedSampler + inference.py:54-73). Two tiers:
simulated process ids for the sharding arithmetic, and a REAL 2-process
``jax.distributed`` run over gloo for the end-to-end gather."""

import json
import os
import subprocess
import sys

import jax
import pytest

import tests.data_factory as factory
from da_detect_tpu.config import get_cfg
from da_detect_tpu.data import make_data_loader


@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("mh_coco")
    dirs = factory.make_triplet_datasets(str(root), n_images=7)  # odd count
    factory.register_tiny_catalog(dirs)
    return str(root), dirs


def _eval_cfg():
    cfg = get_cfg()
    cfg.TPU.IMAGE_SHAPE = (128, 160)
    cfg.INPUT.MIN_SIZE_TEST = 120
    cfg.INPUT.MAX_SIZE_TEST = 160
    cfg.INPUT.MIN_SIZE_TRAIN = (120,)
    cfg.INPUT.MAX_SIZE_TRAIN = 160
    cfg.DATASETS.TEST = ("tiny_clean_cocostyle",)
    cfg.DATASETS.TRAIN = ("tiny_clean_cocostyle",)
    cfg.TEST.IMS_PER_BATCH = 2
    cfg.SOLVER.IMS_PER_BATCH = 2
    return cfg


def test_eval_loader_shards_partition_dataset(tiny_data, monkeypatch):
    """The union of per-process eval shards is the whole dataset, disjointly
    (reference DistributedSampler without padding duplicates)."""
    _, dirs = tiny_data
    cfg = _eval_cfg()
    shards = []
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    for pid in range(2):
        monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
        loader, dataset = make_data_loader(cfg, is_train=False)
        ids = []
        for _, batch_ids in loader:
            ids += [i for i in batch_ids if i is not None]
        shards.append(ids)
    all_ids = shards[0] + shards[1]
    assert len(all_ids) == len(set(all_ids)), "overlapping shards"
    assert set(all_ids) == set(dataset.ids), "incomplete eval coverage"
    # 7 images over 2 processes: 4 + 3
    assert sorted(map(len, shards)) == [3, 4]


def test_train_loader_shards_are_disjoint(tiny_data, monkeypatch):
    _, dirs = tiny_data
    cfg = _eval_cfg()
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    seen = []
    for pid in range(2):
        monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
        loader, dataset = make_data_loader(cfg, is_train=True, infinite=False,
                                           shuffle=False)
        ids = set()
        for batch, targets in loader:
            ids.add(batch.images.shape[0])  # smoke: batches exist
        seen.append(ids)
    assert all(seen)


@pytest.mark.slow
def test_two_process_distributed_eval_merge(tiny_data, tmp_path):
    """REAL 2-process jax.distributed (gloo) run of loader sharding +
    accumulate_predictions: both processes must see the merged full set."""
    root, _ = tiny_data
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""  # default 1 CPU device per process
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    outs = [str(tmp_path / f"out{i}.json") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(repo, "tests/multihost_harness.py"),
         str(i), root, outs[i]],
        env=env, cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    logs = [p.communicate(timeout=300)[0] for p in procs]
    for p, log_text in zip(procs, logs):
        assert p.returncode == 0, f"harness failed:\n{log_text[-3000:]}"
    results = [json.load(open(o)) for o in outs]
    assert results[0]["n_merged"] == results[1]["n_merged"] == 7
    assert results[0]["n_local"] + results[1]["n_local"] == 7
    assert results[0]["n_total_reduced"] == 7.0
