"""Training: train state, plateau LR schedule, orbax checkpoints, loop."""

from vfi_tpu.train.state import TrainState, PlateauScheduler, create_train_state, set_learning_rate
from vfi_tpu.train.loop import Trainer, make_train_step, make_eval_step

__all__ = [
    "TrainState",
    "PlateauScheduler",
    "create_train_state",
    "set_learning_rate",
    "Trainer",
    "make_train_step",
    "make_eval_step",
]
