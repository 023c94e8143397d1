"""lean-explore-tpu: a TPU-native hybrid search framework for Lean 4 declarations.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
`justincasher/lean-explore` (reference: /root/reference/src/lean_explore):

- Dense semantic retrieval runs as a tiled matmul + exact chunked top-k over
  HBM-resident, mesh-sharded embedding matrices (replaces FAISS IVF,
  reference search/engine.py:240-250).
- BM25 lexical scoring reproduces bm25s "bm25+" math over CSR postings
  (reference search/engine.py:192-223, extract/index.py:238-266).
- The Qwen3 embedder/reranker run as batched, jitted JAX forward passes
  (replaces torch/sentence-transformers, reference util/*.py).
- Fusion (RRF + dependency boost + weighted final score) is bit-compatible
  with the reference (engine.py:263-416).

Subpackages are imported lazily so `import lean_explore_tpu` never pulls in
JAX (mirrors the reference's lazy-import discipline, search/__init__.py:12-29).
"""

from importlib import import_module
from typing import TYPE_CHECKING

__version__ = "0.5.0"

_LAZY_ATTRS = {
    "Config": "lean_explore_tpu.config",
    "SearchResult": "lean_explore_tpu.models",
    "SearchResponse": "lean_explore_tpu.models",
    "SearchResultSummary": "lean_explore_tpu.models",
    "SearchSummaryResponse": "lean_explore_tpu.models",
    "Declaration": "lean_explore_tpu.models",
    "SearchEngine": "lean_explore_tpu.search",
    "Service": "lean_explore_tpu.search",
    "ApiClient": "lean_explore_tpu.api",
}

if TYPE_CHECKING:  # pragma: no cover
    from lean_explore_tpu.api import ApiClient
    from lean_explore_tpu.config import Config
    from lean_explore_tpu.models import (
        Declaration,
        SearchResponse,
        SearchResult,
        SearchResultSummary,
        SearchSummaryResponse,
    )
    from lean_explore_tpu.search import SearchEngine, Service


def __getattr__(name: str):
    module_name = _LAZY_ATTRS.get(name)
    if module_name is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    return getattr(import_module(module_name), name)


def __dir__() -> list[str]:
    return sorted(set(globals()) | set(_LAZY_ATTRS))
