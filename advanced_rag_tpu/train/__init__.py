"""Trainer: contrastive bi-encoder fine-tuning over a (data, model) mesh."""

from .contrastive import (
    TrainConfig,
    build_train_mesh,
    make_optimizer,
    make_train_step,
    param_partition_spec,
    synthetic_pair_batch,
)
from .loop import TrainLoopConfig, load_params, save_params, train_biencoder

__all__ = [
    "TrainConfig",
    "TrainLoopConfig",
    "build_train_mesh",
    "load_params",
    "make_optimizer",
    "make_train_step",
    "param_partition_spec",
    "save_params",
    "synthetic_pair_batch",
    "train_biencoder",
]
