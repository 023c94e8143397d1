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


class TestInit:
    def test_parameter_overrides_env(self, monkeypatch):
        monkeypatch.setenv("LEANEXPLORE_API_KEY", "from-env")
        assert ApiClient(api_key="explicit").api_key == "explicit"

    def test_timeouts(self):
        assert ApiClient(api_key="k").timeout == 10.0
        assert ApiClient(api_key="k", timeout=3.5).timeout == 3.5

    def test_default_base_url(self):
        from lean_explore_tpu.config import Config

        assert ApiClient(api_key="k").base_url == Config.API_BASE_URL.rstrip("/")

    def test_base_url_override_strips_slash(self):
        client = ApiClient(api_key="k", base_url="https://x/api/v2/")
        assert client.base_url == "https://x/api/v2"


class TestSearchEdgeCases:
    def test_empty_results(self):
        client = make_client(lambda r: httpx.Response(200, json={"results": []}))
        resp = run(client.search("nothing matches"))
        assert resp.count == 0 and resp.results == []

    def test_default_limit_in_params(self):
        seen = {}

        def handler(request):
            seen["url"] = str(request.url)
            return httpx.Response(200, json={"results": []})

        run(make_client(handler).search("q"))
        assert "limit=20" in seen["url"]  # reference default (client.py:42)

    def test_no_packages_param_when_unset(self):
        seen = {}

        def handler(request):
            seen["url"] = str(request.url)
            return httpx.Response(200, json={"results": []})

        run(make_client(handler).search("q"))
        assert "packages" not in seen["url"]


class TestGetByIdContract:
    def test_endpoint_and_auth(self):
        seen = {}

        def handler(request):
            seen["url"] = str(request.url)
            seen["auth"] = request.headers.get("Authorization")
            return httpx.Response(200, json=RESULT)

        run(make_client(handler).get_by_id(42))
        assert seen["url"].endswith("/declarations/42")
        assert seen["auth"] == "Bearer key-123"
