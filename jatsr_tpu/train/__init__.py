from .schedule import warmup_cosine
from .state import TrainState, create_train_state
from .step import make_eval_step, make_train_step

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "warmup_cosine",
]
