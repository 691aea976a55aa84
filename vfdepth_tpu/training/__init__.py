from .model import VFDepthModel, loss_config_from
from .step import (
    TrainState,
    create_train_state,
    build_train_step,
    build_eval_step,
    shard_train_step,
    make_optimizer,
)
from .checkpoint import save_checkpoint, load_checkpoint
from .trainer import Trainer

__all__ = [
    "VFDepthModel", "loss_config_from",
    "TrainState", "create_train_state", "build_train_step", "build_eval_step",
    "shard_train_step", "make_optimizer",
    "save_checkpoint", "load_checkpoint",
    "Trainer",
]
