from .detector import GeneralizedRCNN, build_detection_model
from .da import DAState

__all__ = ["GeneralizedRCNN", "build_detection_model", "DAState"]
