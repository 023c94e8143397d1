"""Data models: wire types and the sqlite3 document store.

Parity surface: reference models/__init__.py:6-13.
"""

from lean_explore_tpu.models.search_types import (
    SearchResponse,
    SearchResult,
    SearchResultSummary,
    SearchSummaryResponse,
    extract_bold_description,
)
from lean_explore_tpu.models.store import (
    Declaration,
    DeclarationStore,
    pack_embedding,
    unpack_embedding,
)

__all__ = [
    "Declaration",
    "DeclarationStore",
    "SearchResponse",
    "SearchResult",
    "SearchResultSummary",
    "SearchSummaryResponse",
    "extract_bold_description",
    "pack_embedding",
    "unpack_embedding",
]
