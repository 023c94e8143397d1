"""Service layer: timing + response envelopes over the engine.

Surface parity with the reference Service (service.py:9-68): same defaults
(limit=20, rerank_top=50), same SearchResponse shape; adds the batched
entry point the TPU serving path is built around.
"""

import time

from lean_explore_tpu.models import SearchResponse, SearchResult
from lean_explore_tpu.search.engine import SearchEngine


class Service:
    """Clean search/get interface used by MCP and library callers."""

    def __init__(self, engine: SearchEngine | None = None):
        self.engine = engine or SearchEngine()

    async def search(
        self,
        query: str,
        limit: int = 20,
        rerank_top: int | None = 50,
        packages: list[str] | None = None,
    ) -> SearchResponse:
        """Search and wrap results with timing metadata."""
        start = time.time()
        results = await self.engine.search(
            query=query, limit=limit, rerank_top=rerank_top, packages=packages
        )
        return SearchResponse(
            query=query,
            results=results,
            count=len(results),
            processing_time_ms=int((time.time() - start) * 1000),
        )

    async def search_batch(
        self,
        queries: list[str],
        limit: int = 20,
        rerank_top: int | None = 50,
        packages: list[str] | None = None,
    ) -> list[SearchResponse]:
        """Batched search: one device program per stage across all queries."""
        start = time.time()
        batches = await self.engine.search_batch(
            queries, limit=limit, rerank_top=rerank_top, packages=packages
        )
        elapsed_ms = int((time.time() - start) * 1000)
        return [
            SearchResponse(
                query=q,
                results=results,
                count=len(results),
                processing_time_ms=elapsed_ms,
            )
            for q, results in zip(queries, batches)
        ]

    async def get_by_id(self, declaration_id: int) -> SearchResult | None:
        return await self.engine.get_by_id(declaration_id)
