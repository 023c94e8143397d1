"""Client delegating embedding to a remote embedding server.

Same surface as the reference's remote client
(/root/reference/src/lean_explore/util/remote_embedding_client.py:12-57):
POST {base_url}/api/v2/embed with {"texts": [...], "is_query": bool}.
"""

import logging

import requests

from lean_explore_tpu.util.embedding_client import EmbeddingResponse

logger = logging.getLogger(__name__)


class RemoteEmbeddingClient:
    """Embeds via a running embedding server instead of local weights."""

    def __init__(
        self,
        base_url: str,
        model_name: str = "remote",
        timeout: float = 60.0,
    ):
        self.base_url = base_url.rstrip("/")
        self.model_name = model_name
        self.timeout = timeout

    def embed_sync(self, texts: list[str], is_query: bool = False):
        import numpy as np

        response = requests.post(
            f"{self.base_url}/api/v2/embed",
            json={"texts": list(texts), "is_query": is_query},
            timeout=self.timeout,
        )
        response.raise_for_status()
        return np.asarray(response.json()["embeddings"], dtype=np.float32)

    async def embed(
        self, texts: list[str], is_query: bool = False
    ) -> EmbeddingResponse:
        import asyncio

        embeddings = await asyncio.to_thread(self.embed_sync, texts, is_query)
        return EmbeddingResponse(
            texts=list(texts),
            embeddings=[row.tolist() for row in embeddings],
            model=self.model_name,
        )
