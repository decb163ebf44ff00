from ov3det.engine.checkpoint import CheckpointManager, restore_eval_checkpoint
from ov3det.engine.runtime import PreemptionGuard, init_multihost, profile_steps
from ov3det.engine.schedule import make_lr_schedule
from ov3det.engine.train import (
    TrainState,
    build_optimizer,
    build_training,
    create_train_state,
    make_eval_step,
    make_train_step,
)

__all__ = [
    "CheckpointManager",
    "restore_eval_checkpoint",
    "PreemptionGuard",
    "init_multihost",
    "profile_steps",
    "make_lr_schedule",
    "TrainState",
    "build_optimizer",
    "build_training",
    "create_train_state",
    "make_eval_step",
    "make_train_step",
]
