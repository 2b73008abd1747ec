from .state import (GradNormQueue, TrainState, create_train_state,
                    make_optimizer)
from .step import make_eval_step, make_train_step
from .loop import Run

__all__ = ["TrainState", "GradNormQueue", "create_train_state",
           "make_optimizer", "make_train_step", "make_eval_step", "Run"]
