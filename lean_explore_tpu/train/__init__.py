"""Training subsystem: sharded contrastive fine-tuning of the embedder."""

from lean_explore_tpu.train.contrastive import (
    ContrastiveBatch,
    infonce_loss,
    init_train_state,
    make_optimizer,
    make_train_step,
    param_partition_specs,
    shard_params,
)

__all__ = [
    "ContrastiveBatch",
    "infonce_loss",
    "init_train_state",
    "make_optimizer",
    "make_train_step",
    "param_partition_specs",
    "shard_params",
]
