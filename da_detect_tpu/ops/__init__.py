from . import box_ops
from .grl import gradient_scalar
from .nms import nms_mask, nms_topk
from .losses import smooth_l1_loss, sigmoid_focal_loss, bce_with_logits

__all__ = [
    "box_ops",
    "gradient_scalar",
    "nms_mask",
    "nms_topk",
    "smooth_l1_loss",
    "sigmoid_focal_loss",
    "bce_with_logits",
]
