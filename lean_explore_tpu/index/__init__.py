"""Index layer: dense (HBM matmul) + BM25 (CSR) indices and artifact I/O."""

from lean_explore_tpu.index.artifacts import (
    IndexArtifacts,
    build_bm25_name_indices,
    build_index_artifacts,
    load_index_artifacts,
)
from lean_explore_tpu.index.bm25 import Bm25Index, Bm25Params
from lean_explore_tpu.index.dense import DenseIndex

__all__ = [
    "Bm25Index",
    "Bm25Params",
    "DenseIndex",
    "IndexArtifacts",
    "build_bm25_name_indices",
    "build_index_artifacts",
    "load_index_artifacts",
]
