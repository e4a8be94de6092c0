"""Subprocess body for the real 2-process multi-host test (run by
tests/test_multihost.py under JAX_PLATFORMS=cpu): each process shards the
eval loader, fabricates predictions for its shard, and the cross-process
merge must reassemble the full eval set on every process (reference
engine/inference.py:54-73 pickle all_gather semantics).

Usage: python tests/multihost_harness.py <process_id> <data_root> <out_file>
"""

import json
import sys

import jax


def main():
    pid, root, out_file = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    jax.distributed.initialize(coordinator_address="127.0.0.1:29517",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2

    import tests.data_factory as factory
    from da_detect_tpu.config import get_cfg
    from da_detect_tpu.data import make_data_loader
    from da_detect_tpu.utils import comm

    dirs = {"clean": (f"{root}/clean", f"{root}/instances.json"),
            "foggy": (f"{root}/foggy", f"{root}/instances.json"),
            "rainy": (f"{root}/rainy", f"{root}/instances.json")}
    factory.register_tiny_catalog(dirs)

    cfg = get_cfg()
    cfg.TPU.IMAGE_SHAPE = (128, 160)
    cfg.INPUT.MIN_SIZE_TEST = 120
    cfg.INPUT.MAX_SIZE_TEST = 160
    cfg.DATASETS.TEST = ("tiny_clean_cocostyle",)
    cfg.TEST.IMS_PER_BATCH = 2

    loader, dataset = make_data_loader(cfg, is_train=False)
    my_ids = []
    for _, ids in loader:
        my_ids += [i for i in ids if i is not None]

    # fabricate a per-shard prediction dict and merge across processes
    predictions = {i: {"rank": pid} for i in my_ids}
    merged = comm.accumulate_predictions(predictions)
    assert set(merged) == set(dataset.ids), (sorted(merged), dataset.ids)

    # shards must be disjoint: every merged entry keeps its producing rank
    n_mine = sum(1 for v in merged.values() if v["rank"] == pid)
    assert n_mine == len(my_ids)

    reduced = comm.reduce_dict({"n": float(len(my_ids))}, average=False)

    with open(out_file, "w") as f:
        json.dump({"pid": pid, "n_local": len(my_ids),
                   "n_merged": len(merged),
                   "n_total_reduced": reduced["n"]}, f)
    print("harness ok", pid)


if __name__ == "__main__":
    main()
