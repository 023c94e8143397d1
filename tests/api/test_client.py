"""ApiClient tests with httpx.MockTransport (parity: reference
tests/api/client_test.py behaviors — auth header, params, 404 -> None)."""

import asyncio
import json

import httpx
import pytest

from lean_explore_tpu.api import ApiClient

RESULT = {
    "id": 1,
    "name": "Nat.add",
    "module": "Init.Nat",
    "docstring": None,
    "source_text": "def Nat.add",
    "source_link": "https://x",
    "dependencies": None,
    "informalization": "**Add.**",
}


def make_client(handler, **kwargs):
    return ApiClient(
        api_key="key-123",
        transport=httpx.MockTransport(handler),
        base_url="https://api.test/api/v2",
        **kwargs,
    )


def run(coro):
    return asyncio.run(coro)


class TestSearch:
    def test_request_contract_and_parse(self):
        seen = {}

        def handler(request: httpx.Request) -> httpx.Response:
            seen["auth"] = request.headers["Authorization"]
            seen["url"] = str(request.url)
            return httpx.Response(
                200, json={"results": [RESULT], "processing_time_ms": 9}
            )

        client = make_client(handler)
        resp = run(client.search("nat add", limit=5, packages=["Mathlib", "Std"]))
        assert seen["auth"] == "Bearer key-123"
        assert "q=nat+add" in seen["url"]
        assert "limit=5" in seen["url"]
        assert "packages=Mathlib%2CStd" in seen["url"] or "packages=Mathlib,Std" in seen["url"]
        assert resp.count == 1
        assert resp.results[0].name == "Nat.add"
        assert resp.processing_time_ms == 9

    def test_rerank_top_ignored(self):
        def handler(request):
            assert "rerank" not in str(request.url)
            return httpx.Response(200, json={"results": []})

        client = make_client(handler)
        resp = run(client.search("q", rerank_top=50))
        assert resp.count == 0

    def test_http_error_raises(self):
        client = make_client(lambda r: httpx.Response(500, json={}))
        with pytest.raises(httpx.HTTPStatusError):
            run(client.search("q"))


class TestGetById:
    def test_found(self):
        client = make_client(lambda r: httpx.Response(200, json=RESULT))
        result = run(client.get_by_id(1))
        assert result.name == "Nat.add"

    def test_404_returns_none(self):
        client = make_client(lambda r: httpx.Response(404, json={}))
        assert run(client.get_by_id(12345)) is None

    def test_other_error_raises(self):
        client = make_client(lambda r: httpx.Response(403, json={}))
        with pytest.raises(httpx.HTTPStatusError):
            run(client.get_by_id(1))


class TestAuth:
    def test_no_key_raises(self, monkeypatch):
        monkeypatch.delenv("LEANEXPLORE_API_KEY", raising=False)
        with pytest.raises(ValueError):
            ApiClient()

    def test_env_key(self, monkeypatch):
        monkeypatch.setenv("LEANEXPLORE_API_KEY", "from-env")
        client = ApiClient()
        assert client.api_key == "from-env"
