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

from lean_explore_tpu.train.checkpoint import (  # noqa: E402
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)

__all__ += ["latest_checkpoint", "restore_checkpoint", "save_checkpoint"]

from lean_explore_tpu.train.data import (  # noqa: E402
    ContrastiveDataLoader,
    pairs_from_store,
)

__all__ += ["ContrastiveDataLoader", "pairs_from_store"]

from lean_explore_tpu.train.cross_encoder import (  # noqa: E402
    CrossEncoderBatch,
    CrossEncoderDataLoader,
    cross_encoder_loss,
    make_ce_train_step,
)

__all__ += [
    "CrossEncoderBatch",
    "CrossEncoderDataLoader",
    "cross_encoder_loss",
    "make_ce_train_step",
]
