from .optim import make_optimizer, param_labels, detectron_sgd
from .schedules import make_lr_scheduler, warmup_cosine, warmup_multistep

__all__ = ["make_optimizer", "param_labels", "detectron_sgd",
           "make_lr_scheduler", "warmup_cosine", "warmup_multistep"]
