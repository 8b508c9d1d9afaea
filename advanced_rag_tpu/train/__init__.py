"""Trainer: contrastive bi-encoder fine-tuning over a (data, model)
mesh, plus label-free cross-encoder distillation from the bi-encoder."""

from .contrastive import (
    TrainConfig,
    build_train_mesh,
    make_optimizer,
    make_train_step,
    param_partition_spec,
    synthetic_pair_batch,
)
from .distill import DistillConfig, distill_cross_encoder
from .loop import (
    TrainLoopConfig,
    load_biencoder,
    load_params,
    save_biencoder,
    save_params,
    train_biencoder,
)
from .rerank import (
    RerankTrainConfig,
    filter_false_negatives,
    load_reranker,
    save_reranker,
    token_jaccard,
    train_reranker,
    warm_start_cross_encoder,
)

__all__ = [
    "DistillConfig",
    "RerankTrainConfig",
    "filter_false_negatives",
    "load_reranker",
    "save_reranker",
    "token_jaccard",
    "train_reranker",
    "warm_start_cross_encoder",
    "TrainConfig",
    "TrainLoopConfig",
    "distill_cross_encoder",
    "build_train_mesh",
    "load_biencoder",
    "load_params",
    "save_biencoder",
    "make_optimizer",
    "make_train_step",
    "param_partition_spec",
    "save_params",
    "synthetic_pair_batch",
    "train_biencoder",
]
