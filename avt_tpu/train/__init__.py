"""Training layer: jitted steps, optax param groups/schedules, loops.

Replaces the reference's func/train.py + func/train_eval_ops.py +
common/scheduler.py with a functional design: ONE jitted train step (loss
weighting, grad, clip, optimizer update) over a TrainState pytree, host-side
epoch loop, orbax checkpointing with fractional-epoch resume.
"""
from avt_tpu.train.ops import basic_loss_accuracy, mode_over_frames
from avt_tpu.train.optim import (
    build_optimizer,
    build_schedule,
    warmup_schedule,
    cosine_schedule,
    multistep_schedule,
)
from avt_tpu.train.step import TrainState, make_train_step, make_eval_step

__all__ = [
    "basic_loss_accuracy",
    "mode_over_frames",
    "build_optimizer",
    "build_schedule",
    "warmup_schedule",
    "cosine_schedule",
    "multistep_schedule",
    "TrainState",
    "make_train_step",
    "make_eval_step",
]
