"""Training: optimizers, jitted steps, train state, checkpoints."""

from nsdp_tpu.training.optim import (
    StepLearningRateSchedule,
    optimizer_factory,
    print_num_parameters,
)
from nsdp_tpu.training.state import TrainState, create_train_state
from nsdp_tpu.training.steps import make_steps
from nsdp_tpu.training.checkpoints import (
    save_checkpoints,
    load_checkpoints,
    save_best_checkpoints,
    load_best_checkpoints,
)

__all__ = [
    "StepLearningRateSchedule",
    "optimizer_factory",
    "print_num_parameters",
    "TrainState",
    "create_train_state",
    "make_steps",
    "save_checkpoints",
    "load_checkpoints",
    "save_best_checkpoints",
    "load_best_checkpoints",
]
