"""CLI-level smoke tests for the public tool entry points (reference
tools/train_net_triplet.py / test_net.py): argparse -> cfg merge ->
training loop -> checkpoint -> eval, on the tiny synthetic triple."""

import os

import numpy as np
import pytest

import tests.data_factory as factory


@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("tiny_coco_cli")
    dirs = factory.make_triplet_datasets(str(root))
    factory.register_tiny_catalog(dirs)
    return dirs


def _common_opts(out_dir):
    return [
        "MODEL.OUTPUT_DIR", str(out_dir),
        "MODEL.OUTPUT_SAVE_NAME", "run",
        "MODEL.ROI_BOX_HEAD.NUM_CLASSES", "3",
        "MODEL.RPN.PRE_NMS_TOP_N_TRAIN", "200",
        "MODEL.RPN.POST_NMS_TOP_N_TRAIN", "64",
        "MODEL.RPN.PRE_NMS_TOP_N_TEST", "200",
        "MODEL.RPN.POST_NMS_TOP_N_TEST", "64",
        "MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE", "32",
        "TPU.COMPUTE_DTYPE", "float32",
        # the conftest's virtual mesh has 8 devices; batch 2 shards over 1
        "TPU.MESH_DATA", "1",
        "TPU.IMAGE_SHAPE", "(128, 160)",
        "TPU.MAX_GT_BOXES", "10",
        "INPUT.MIN_SIZE_TRAIN", "(120,)",
        "INPUT.MAX_SIZE_TRAIN", "160",
        "INPUT.MIN_SIZE_TEST", "120",
        "INPUT.MAX_SIZE_TEST", "160",
        "DATASETS.SOURCE_TRAIN", "('tiny_clean_cocostyle',)",
        "DATASETS.TARGET_TRAIN", "('tiny_foggy_cocostyle',)",
        "DATASETS.TARGET_TRAIN_negative", "('tiny_rainy_cocostyle',)",
        "DATASETS.TRAIN", "('tiny_clean_cocostyle',)",
        "DATASETS.TEST", "('tiny_foggy_cocostyle',)",
        "SOLVER.IMS_PER_BATCH", "2",
        "SOLVER.MAX_ITER", "2",
        "SOLVER.CHECKPOINT_PERIOD", "2",
        "TEST.IMS_PER_BATCH", "2",
        "TEST.DETECTIONS_PER_IMG", "10",
    ]


def test_train_net_triplet_then_test_net_cli(tiny_data, tmp_path):
    from da_detect_tpu.tools import test_net, train_net_triplet

    out = tmp_path / "out"
    train_net_triplet.main(["--skip-test"] + _common_opts(out)
                           + ["MODEL.DOMAIN_ADAPTATION_ON", "True"])
    run_dir = out / "run"
    assert (run_dir / "last_checkpoint").exists()

    test_net.main(["--ckpt", str(run_dir)] + _common_opts(out))
    assert (run_dir / "coco_results.json").exists()


def test_train_net_source_only_cli(tiny_data, tmp_path):
    from da_detect_tpu.tools import train_net

    out = tmp_path / "out_src"
    train_net.main(["--skip-test"] + _common_opts(out)
                   + ["MODEL.DOMAIN_ADAPTATION_ON", "False"])
    assert (out / "run" / "last_checkpoint").exists()


def test_quick_schedule_expected_results_gate(tiny_data, tmp_path):
    """The quick-schedule integration gate, end-to-end through the CLI
    (reference quick_schedules yamls + check_expected_results,
    coco_eval.py:396-414 there): `train_net --config-file <quick yaml>`
    trains, evaluates, and routes the results through
    TEST.EXPECTED_RESULTS. The shipped window passes; a sabotaged window
    must abort the run with the gate's AssertionError — proving the gate
    itself is live, not just configured."""
    from da_detect_tpu.tools import train_net

    cfg_file = os.path.join(os.path.dirname(__file__), "..", "configs",
                            "quick_schedules",
                            "e2e_faster_rcnn_R_50_C4_tiny_gate.yaml")
    out = tmp_path / "gate"
    args = ["--config-file", cfg_file,
            "MODEL.OUTPUT_DIR", str(out), "MODEL.OUTPUT_SAVE_NAME", "run"]
    train_net.main(args)  # gate engaged (no --skip-test) and passes
    assert (out / "run" / "last_checkpoint").exists()

    # sabotage: an impossible window [4.6, 5.4] on the same trained run —
    # training resumes at MAX_ITER (no-op) and goes straight to the gated
    # eval, which must abort
    with pytest.raises(AssertionError, match="bbox > AP50"):
        train_net.main(args + [
            "TEST.EXPECTED_RESULTS", "(('bbox', 'AP50', 5.0, 0.1),)"])


def test_batch_mesh_divisibility_guard(tiny_data):
    """An indivisible batch/mesh combination must fail loudly at loader
    build time (reference asserts IMS_PER_BATCH % (2*num_gpus) == 0), not
    as a device_put shape error inside the prefetch thread."""
    from da_detect_tpu.config import get_cfg
    from da_detect_tpu.data import make_data_loader
    from da_detect_tpu.parallel import data_sharding, make_mesh

    cfg = get_cfg()
    cfg.DATASETS.TRAIN = ("tiny_clean_cocostyle",)
    cfg.SOLVER.IMS_PER_BATCH = 2
    mesh = make_mesh(-1)
    # precondition, asserted so an env where the virtual 8-device mesh was
    # not applied fails with a clear message instead of "DID NOT RAISE"
    assert mesh.devices.size == 8, (
        f"expected the conftest 8-device CPU mesh, got {mesh.devices!r}")
    with pytest.raises(ValueError, match="not divisible by the data-mesh"):
        make_data_loader(cfg, is_train=True, sharding=data_sharding(mesh))


def test_stage_dataset_cli(tiny_data, tmp_path):
    """Offline staging CLI: pre-stages every (image, geometry) variant of
    the DA triplet datasets; a subsequent loader epoch is all cache hits
    (no decode on the training path)."""
    from da_detect_tpu.config import get_cfg
    from da_detect_tpu.data import make_data_loader_da
    from da_detect_tpu.tools import stage_dataset

    stage = tmp_path / "stage"
    opts = _common_opts(tmp_path / "out") + [
        "DATALOADER.STAGE_DIR", str(stage)]
    n = stage_dataset.main(opts)
    # 3 datasets x images x 2 flip variants x 1 min_size
    assert n > 0 and n % 2 == 0
    assert any(stage.rglob("*.npy"))

    cfg = get_cfg()
    cfg.merge_from_list(opts)
    loader = make_data_loader_da(cfg, aligned=True, seed=0)
    it = iter(loader)
    for _ in range(3):
        next(it)
    stats = loader.stats
    loader.close()
    assert stats["stage_misses"] == 0 and stats["stage_hits"] > 0
    assert "decode_s" not in stats
