"""Trainer: contrastive bi-encoder fine-tuning over a (data, model) mesh."""

from .contrastive import (
    TrainConfig,
    build_train_mesh,
    make_optimizer,
    make_train_step,
    param_partition_spec,
    synthetic_pair_batch,
)

__all__ = [
    "TrainConfig",
    "build_train_mesh",
    "make_optimizer",
    "make_train_step",
    "param_partition_spec",
    "synthetic_pair_batch",
]
