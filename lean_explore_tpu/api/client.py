"""Async client for the remote Lean Explore HTTP API.

Parity surface: reference api/client.py:11-104 — Bearer auth from
LEANEXPLORE_API_KEY, GET /search with q/limit/packages params (rerank_top
accepted and ignored; the server reranks), GET /declarations/{id} with
404 -> None.
"""

import os

import httpx

from lean_explore_tpu.config import Config
from lean_explore_tpu.models import SearchResponse, SearchResult


class ApiClient:
    """Async HTTPS client matching the local Service's search/get surface."""

    def __init__(
        self,
        api_key: str | None = None,
        timeout: float = 10.0,
        base_url: str | None = None,
        transport: httpx.AsyncBaseTransport | None = None,
    ):
        self.base_url: str = (base_url or Config.API_BASE_URL).rstrip("/")
        self.api_key: str = api_key or os.getenv("LEANEXPLORE_API_KEY", "")
        if not self.api_key:
            raise ValueError(
                "API key required. Pass api_key or set the LEANEXPLORE_API_KEY "
                "environment variable."
            )
        self.timeout = timeout
        self._headers = {"Authorization": f"Bearer {self.api_key}"}
        self._transport = transport

    async def search(
        self,
        query: str,
        limit: int = 20,
        rerank_top: int | None = None,
        packages: list[str] | None = None,
    ) -> SearchResponse:
        """GET /search. rerank_top is ignored (server-side reranking)."""
        del rerank_top
        params: dict[str, str | int] = {"q": query, "limit": limit}
        if packages:
            params["packages"] = ",".join(packages)

        async with httpx.AsyncClient(
            timeout=self.timeout, transport=self._transport
        ) as client:
            response = await client.get(
                f"{self.base_url}/search", params=params, headers=self._headers
            )
            response.raise_for_status()
            data = response.json()

        results = [SearchResult(**item) for item in data.get("results", [])]
        return SearchResponse(
            query=query,
            results=results,
            count=len(results),
            processing_time_ms=data.get("processing_time_ms"),
        )

    async def get_by_id(self, declaration_id: int) -> SearchResult | None:
        """GET /declarations/{id}; 404 -> None."""
        async with httpx.AsyncClient(
            timeout=self.timeout, transport=self._transport
        ) as client:
            response = await client.get(
                f"{self.base_url}/declarations/{declaration_id}",
                headers=self._headers,
            )
            if response.status_code == 404:
                return None
            response.raise_for_status()
            return SearchResult(**response.json())
