"""One-shot: render the reference config zoo's missing yamls in this
framework's canonical format (provenance header, fixed section order).

The yacs KEY PATHS and hyperparameter VALUES are the public API this
framework preserves (SURVEY §5.6); the emission format/ordering/comments are
ours. Existing files are never overwritten.

Run from the repo root: python scripts/port_config_zoo.py
"""

from __future__ import annotations

import glob
import os

import yaml

SRC = "/root/reference/configs"
DST = "configs"

HEADER = """# {name}
# Key-compatible rendition of the reference zoo config of the same name:
# the yacs key paths and published hyperparameters are the public API this
# framework preserves (BASELINE.md); the runtime consuming them is the
# TPU-native stack in da_detect_tpu/. Dataset names resolve through
# config/catalog.py under $DA_DETECT_DATA_DIR; weights through
# $DA_DETECT_WEIGHTS_DIR.
"""

SECTION_ORDER = ["MODEL", "INPUT", "DATASETS", "DATALOADER", "SOLVER", "TEST",
                 "OUTPUT_DIR", "TENSORBOARD_EXPERIMENT"]
SECTION_NOTE = {
    "MODEL": "# -- model: meta-architecture, backbone body, heads --",
    "INPUT": "# -- input: resize/normalization (static canvases on TPU) --",
    "DATASETS": "# -- datasets: catalog names --",
    "DATALOADER": "# -- loader --",
    "SOLVER": "# -- schedule: Detectron SGD rules; one jitted step/iter --",
    "TEST": "# -- evaluation --",
}


def _fmt(v):
    if isinstance(v, bool):
        return "True" if v else "False"
    if isinstance(v, str):
        # keep tuple-literals bare (yacs literal-evals them); quote the rest
        if v.startswith("(") and v.endswith(")"):
            return v
        return f'"{v}"'
    return str(v)


def _emit(d, indent=0):
    lines = []
    for k, v in d.items():
        pad = "  " * indent
        if isinstance(v, dict):
            lines.append(f"{pad}{k}:")
            lines.extend(_emit(v, indent + 1))
        else:
            lines.append(f"{pad}{k}: {_fmt(v)}")
    return lines


def render(src_path: str, name: str) -> str:
    with open(src_path) as f:
        tree = yaml.safe_load(f)
    out = [HEADER.format(name=name).rstrip()]
    keys = ([k for k in SECTION_ORDER if k in tree]
            + [k for k in tree if k not in SECTION_ORDER])
    for k in keys:
        if k in SECTION_NOTE:
            out.append(SECTION_NOTE[k])
        v = tree[k]
        if isinstance(v, dict):
            out.append(f"{k}:")
            out.extend(_emit(v, 1))
        else:
            out.append(f"{k}: {_fmt(v)}")
    return "\n".join(out) + "\n"


def main():
    made = 0
    for src in sorted(glob.glob(os.path.join(SRC, "**", "*.yaml"),
                                recursive=True)):
        rel = os.path.relpath(src, SRC)
        dst = os.path.join(DST, rel)
        if os.path.exists(dst):
            continue
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        with open(dst, "w") as f:
            f.write(render(src, os.path.basename(rel)))
        made += 1
        print("wrote", dst)
    print(f"{made} configs written")


if __name__ == "__main__":
    main()
