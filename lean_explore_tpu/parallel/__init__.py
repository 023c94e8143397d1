"""Parallelism layer: meshes, corpus-sharded retrieval, sharded training."""

from lean_explore_tpu.parallel.mesh import SERVE_AXES, TRAIN_AXES, make_mesh
from lean_explore_tpu.parallel.sharded import ShardedDenseIndex, make_sharded_topk

__all__ = [
    "SERVE_AXES",
    "TRAIN_AXES",
    "ShardedDenseIndex",
    "make_mesh",
    "make_sharded_topk",
]
