from .coco import COCODataset, ConcatDataset
from .voc import PascalVOCDataset

__all__ = ["COCODataset", "ConcatDataset", "PascalVOCDataset"]
