from .backbone import build_backbone, BACKBONES, BackboneSpec
from .resnet import ResNet, ResNetHead
from .fpn import FPN

__all__ = ["build_backbone", "BACKBONES", "BackboneSpec", "ResNet", "ResNetHead", "FPN"]
