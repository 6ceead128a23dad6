"""L3 training: schedules, train state, jit/pjit train steps, hard-negative
mining, Orbax checkpointing, and the driver loop (SURVEY.md §3.1)."""

from epcnet_tpu.train.state import TrainState, create_train_state, lr_schedule, bn_momentum_schedule
from epcnet_tpu.train.step import build_train_step, build_multi_train_step, build_embed_fn
from epcnet_tpu.train.mining import MiningCache
from epcnet_tpu.train.trainer import Trainer

__all__ = [
    "TrainState",
    "create_train_state",
    "lr_schedule",
    "bn_momentum_schedule",
    "build_train_step",
    "build_multi_train_step",
    "build_embed_fn",
    "MiningCache",
    "Trainer",
]
