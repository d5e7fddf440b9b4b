from .trainer import (
    OptimizerConfig,
    TrainState,
    init_train_state,
    init_train_state_sharded,
    make_optimizer,
    make_schedule,
    make_train_step,
    project_params,
)

__all__ = [
    "OptimizerConfig",
    "TrainState",
    "init_train_state",
    "init_train_state_sharded",
    "make_optimizer",
    "make_schedule",
    "make_train_step",
    "project_params",
]
