from .trainer import TrainState, create_train_state, make_train_step, do_train
from .inference import inference

__all__ = ["TrainState", "create_train_state", "make_train_step", "do_train",
           "inference"]
