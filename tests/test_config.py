import glob
import os

import pytest

from da_detect_tpu.config import get_cfg, ConfigError

REF_CONFIG_DIR = "/root/reference/configs"
REPO_CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_defaults_roundtrip():
    cfg = get_cfg()
    assert cfg.MODEL.BACKBONE.CONV_BODY == "R-50-C4"
    assert cfg.MODEL.RPN.ANCHOR_SIZES == (32, 64, 128, 256, 512)
    c2 = cfg.clone()
    c2.MODEL.BACKBONE.CONV_BODY = "R-101-FPN"
    assert cfg.MODEL.BACKBONE.CONV_BODY == "R-50-C4"


def test_merge_from_list():
    cfg = get_cfg()
    cfg.merge_from_list(["SOLVER.BASE_LR", "0.02", "MODEL.RPN.USE_FPN", "True",
                         "DATASETS.TRAIN", "('a','b')"])
    assert cfg.SOLVER.BASE_LR == 0.02
    assert cfg.MODEL.RPN.USE_FPN is True
    assert cfg.DATASETS.TRAIN == ("a", "b")


def test_unknown_key_rejected():
    cfg = get_cfg()
    with pytest.raises(ConfigError):
        cfg.merge_from_list(["SOLVER.NO_SUCH_KEY", "1"])


def test_freeze():
    cfg = get_cfg()
    cfg.freeze()
    with pytest.raises(ConfigError):
        cfg.SOLVER.BASE_LR = 1.0
    cfg.defrost()
    cfg.SOLVER.BASE_LR = 1.0


def _yaml_zoo():
    if not os.path.isdir(REF_CONFIG_DIR):
        return []
    paths = glob.glob(f"{REF_CONFIG_DIR}/**/*.y*ml", recursive=True)
    # caffe2 zoo uses WEIGHT-only inference configs; still should parse
    return sorted(paths)


@pytest.mark.parametrize("path", _yaml_zoo(), ids=lambda p: os.path.relpath(p, REF_CONFIG_DIR))
def test_reference_yaml_zoo_parses(path):
    """Every reference config yaml must merge cleanly against our defaults
    (mirror of reference tests/test_configs.py)."""
    cfg = get_cfg()
    cfg.merge_from_file(path)


def test_own_config_zoo_parses():
    for path in sorted(glob.glob(f"{REPO_CONFIG_DIR}/**/*.y*ml", recursive=True)):
        cfg = get_cfg()
        cfg.merge_from_file(path)
