"""Training: optimizers, losses, jitted train/eval steps."""

from qagnn_tpu.train.losses import LOSSES, cross_entropy_loss, margin_rank_loss
from qagnn_tpu.train.optim import (
    build_train_optimizer,
    make_lr_schedule,
    make_optimizer,
    radam,
    scale_by_radam_ref,
)
from qagnn_tpu.train.step import (
    Batch,
    TrainState,
    accuracy,
    init_train_state,
    make_detail_step,
    make_eval_step,
    make_train_step,
)

__all__ = [
    "LOSSES", "cross_entropy_loss", "margin_rank_loss",
    "build_train_optimizer", "make_lr_schedule", "make_optimizer", "radam",
    "scale_by_radam_ref", "Batch", "TrainState", "accuracy",
    "init_train_state", "make_detail_step", "make_eval_step",
    "make_train_step",
]
