"""Evaluation dispatch (reference data/datasets/evaluation/__init__.py).

``style="cityscapes"`` selects the cityscapes-native instance-level AP
protocol (the evaluator the reference vendors under tools/cityscapes/...)
instead of COCO AP; both run on cocostyle jsons.
"""

from __future__ import annotations

from ..datasets import COCODataset, ConcatDataset, PascalVOCDataset
from .cityscapes_eval import do_cityscapes_evaluation
from .coco_eval import do_coco_evaluation
from .voc_eval import do_voc_evaluation


def evaluate(dataset, predictions, output_folder=None, iou_types=("bbox",),
             style: str = "coco", **kwargs):
    if isinstance(dataset, ConcatDataset):
        raise NotImplementedError("evaluate each test dataset separately")
    if isinstance(dataset, COCODataset):
        if style == "cityscapes":
            return do_cityscapes_evaluation(dataset, predictions,
                                            output_folder, iou_types)
        return do_coco_evaluation(dataset, predictions, output_folder,
                                  iou_types)
    if isinstance(dataset, PascalVOCDataset):
        return do_voc_evaluation(dataset, predictions, output_folder, **kwargs)
    raise NotImplementedError(f"no evaluator for {type(dataset)}")
