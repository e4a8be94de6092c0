from .boxes import Boxes
from .image_batch import ImageBatch, Targets

__all__ = ["Boxes", "ImageBatch", "Targets"]
