"""MCP layer tests: protocol unit tests + a stdio subprocess end-to-end run."""

import asyncio
import json
import os
import subprocess
import sys

import pytest

from lean_explore_tpu.mcp.jsonrpc import McpServer
from lean_explore_tpu.models import SearchResponse, SearchResult


def run(coro):
    return asyncio.run(coro)


def _result_of(response):
    assert "error" not in response, response
    return response["result"]


class TestProtocol:
    @pytest.fixture
    def server(self):
        server = McpServer(name="TestServer", version="0.0.1", instructions="hi")

        @server.tool(
            name="echo",
            description="echo text",
            input_schema={
                "type": "object",
                "properties": {"text": {"type": "string"}},
                "required": ["text"],
            },
        )
        async def echo(text):
            return {"echoed": text}

        @server.tool(
            name="boom", description="always fails", input_schema={"type": "object"}
        )
        async def boom():
            raise RuntimeError("kaput")

        return server

    def test_initialize(self, server):
        resp = run(server.handle_message({"jsonrpc": "2.0", "id": 1, "method": "initialize"}))
        result = _result_of(resp)
        assert result["serverInfo"]["name"] == "TestServer"
        assert result["instructions"] == "hi"
        assert "tools" in result["capabilities"]

    def test_notification_no_response(self, server):
        assert run(
            server.handle_message(
                {"jsonrpc": "2.0", "method": "notifications/initialized"}
            )
        ) is None

    def test_tools_list(self, server):
        resp = run(server.handle_message({"jsonrpc": "2.0", "id": 2, "method": "tools/list"}))
        tools = _result_of(resp)["tools"]
        assert {t["name"] for t in tools} == {"echo", "boom"}
        assert tools[0]["inputSchema"]["type"] == "object"

    def test_tools_call(self, server):
        resp = run(
            server.handle_message(
                {
                    "jsonrpc": "2.0",
                    "id": 3,
                    "method": "tools/call",
                    "params": {"name": "echo", "arguments": {"text": "hello"}},
                }
            )
        )
        result = _result_of(resp)
        assert result["isError"] is False
        assert json.loads(result["content"][0]["text"]) == {"echoed": "hello"}
        assert result["structuredContent"] == {"echoed": "hello"}

    def test_tool_error_in_band(self, server):
        resp = run(
            server.handle_message(
                {
                    "jsonrpc": "2.0",
                    "id": 4,
                    "method": "tools/call",
                    "params": {"name": "boom", "arguments": {}},
                }
            )
        )
        result = _result_of(resp)
        assert result["isError"] is True
        assert "kaput" in result["content"][0]["text"]

    def test_unknown_tool(self, server):
        resp = run(
            server.handle_message(
                {
                    "jsonrpc": "2.0",
                    "id": 5,
                    "method": "tools/call",
                    "params": {"name": "nope"},
                }
            )
        )
        assert resp["error"]["code"] == -32602

    def test_unknown_method(self, server):
        resp = run(server.handle_message({"jsonrpc": "2.0", "id": 6, "method": "bogus"}))
        assert resp["error"]["code"] == -32601

    def test_malformed_shapes_never_raise(self, server):
        """One bad client message must not kill the server loop: arrays
        (batching unsupported), non-string methods, and non-object
        messages answer INVALID_REQUEST or stay silent — never raise."""
        batch = run(server.handle_message([{"id": 1, "method": "ping"}]))
        assert batch["error"]["code"] == -32600
        bad_method = run(server.handle_message({"id": 1, "method": 123}))
        assert bad_method["error"]["code"] == -32600
        # Non-string method without an id: silent (notification-like).
        assert run(server.handle_message({"method": 123})) is None

    def test_request_without_id_is_notification(self, server):
        """JSON-RPC 2.0: no id -> no response (an id:null reply would be
        misrouted by conforming clients)."""
        assert run(server.handle_message({"jsonrpc": "2.0", "method": "ping"})) is None

    def test_non_dict_output_omits_structured_content(self, server):
        @server.tool(
            name="none_tool", description="returns null",
            input_schema={"type": "object"},
        )
        async def none_tool():
            return None

        resp = run(
            server.handle_message(
                {
                    "jsonrpc": "2.0",
                    "id": 9,
                    "method": "tools/call",
                    "params": {"name": "none_tool", "arguments": {}},
                }
            )
        )
        result = _result_of(resp)
        # Optional per the MCP schema: omitted, never an explicit null.
        assert "structuredContent" not in result
        assert result["content"][0]["text"] == "null"

    def test_internal_typeerror_is_not_invalid_params(self, server):
        """A TypeError raised INSIDE a running tool is a bug, not a
        params mismatch — it must take the in-band error path (logged),
        not masquerade as -32602."""

        @server.tool(
            name="buggy", description="raises TypeError internally",
            input_schema={"type": "object"},
        )
        async def buggy():
            return len(None)  # TypeError from inside the tool body

        resp = run(
            server.handle_message(
                {
                    "jsonrpc": "2.0",
                    "id": 10,
                    "method": "tools/call",
                    "params": {"name": "buggy", "arguments": {}},
                }
            )
        )
        result = _result_of(resp)
        assert result["isError"] is True

    def test_bad_arguments(self, server):
        resp = run(
            server.handle_message(
                {
                    "jsonrpc": "2.0",
                    "id": 7,
                    "method": "tools/call",
                    "params": {"name": "echo", "arguments": {"wrong": 1}},
                }
            )
        )
        assert resp["error"]["code"] == -32602

    def test_ping(self, server):
        resp = run(server.handle_message({"jsonrpc": "2.0", "id": 8, "method": "ping"}))
        assert _result_of(resp) == {}


class FakeBackend:
    """Async backend double with the Service surface."""

    def __init__(self):
        self.result = SearchResult(
            id=7,
            name="Nat.add",
            module="Init.Nat",
            docstring="adds",
            source_text="def Nat.add",
            source_link="https://x",
            dependencies='["Nat"]',
            informalization="**Addition.** adds naturals",
        )

    async def search(self, query, limit, rerank_top, packages):
        return SearchResponse(
            query=query, results=[self.result], count=1, processing_time_ms=3
        )

    async def get_by_id(self, declaration_id):
        return self.result if declaration_id == 7 else None


class TestTools:
    @pytest.fixture(autouse=True)
    def backend(self):
        from lean_explore_tpu.mcp import tools  # noqa: F401 — register
        from lean_explore_tpu.mcp import app

        app.set_backend_service(FakeBackend())
        yield
        app._backend_service = None

    def test_all_eight_registered(self):
        from lean_explore_tpu.mcp.app import mcp_app

        assert {
            "search",
            "search_summary",
            "get_source_code",
            "get_source_link",
            "get_docstring",
            "get_description",
            "get_module",
            "get_dependencies",
        } <= set(mcp_app.tools)

    def test_search(self):
        from lean_explore_tpu.mcp import tools

        out = run(tools.search(query="nat add"))
        assert out["count"] == 1
        assert out["results"][0]["name"] == "Nat.add"

    def test_search_summary_slim(self):
        from lean_explore_tpu.mcp import tools

        out = run(tools.search_summary(query="nat add"))
        assert out["results"][0] == {
            "id": 7,
            "name": "Nat.add",
            "description": "Addition.",
        }
        assert "source_text" not in json.dumps(out)

    def test_field_getters(self):
        from lean_explore_tpu.mcp import tools

        assert run(tools.get_source_code(declaration_id=7))["source_text"] == "def Nat.add"
        assert run(tools.get_source_link(declaration_id=7))["source_link"] == "https://x"
        assert run(tools.get_docstring(declaration_id=7))["docstring"] == "adds"
        assert (
            run(tools.get_description(declaration_id=7))["informalization"]
            == "**Addition.** adds naturals"
        )
        assert run(tools.get_module(declaration_id=7))["module"] == "Init.Nat"
        assert run(tools.get_dependencies(declaration_id=7))["dependencies"] == '["Nat"]'

    def test_missing_id_returns_none(self):
        from lean_explore_tpu.mcp import tools

        assert run(tools.get_source_code(declaration_id=999)) is None


@pytest.mark.integration
class TestStdioEndToEnd:
    def test_subprocess_session(self, tmp_path):
        """Full stdio session against a BM25-only artifact set (no model
        weights needed: no embeddings -> semantic stage skipped;
        rerank_top=0 -> no reranker)."""
        from lean_explore_tpu.index import build_index_artifacts
        from lean_explore_tpu.models import DeclarationStore
        from tests.conftest import make_declaration

        store = DeclarationStore(tmp_path / "declarations.db", create=True)
        store.insert_many(
            [
                make_declaration("Nat.add", "Init.Nat"),
                make_declaration("List.map", "Init.List"),
            ]
        )
        build_index_artifacts(store, tmp_path)
        store.close()

        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)  # no axon registration
        env.pop("JAX_PLATFORMS", None)  # default to cpu
        proc = subprocess.Popen(
            [
                sys.executable,
                "-m",
                "lean_explore_tpu.mcp.server",
                "--backend",
                "local",
                "--data-dir",
                str(tmp_path),
            ],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            text=True,
        )
        messages = [
            {"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}},
            {"jsonrpc": "2.0", "method": "notifications/initialized"},
            {"jsonrpc": "2.0", "id": 2, "method": "tools/list"},
            {
                "jsonrpc": "2.0",
                "id": 3,
                "method": "tools/call",
                "params": {
                    "name": "search_summary",
                    "arguments": {"query": "Nat.add", "rerank_top": 0},
                },
            },
            {
                "jsonrpc": "2.0",
                "id": 4,
                "method": "tools/call",
                "params": {"name": "get_module", "arguments": {"declaration_id": 1}},
            },
        ]
        stdin_payload = "".join(json.dumps(m) + "\n" for m in messages)
        try:
            stdout, stderr = proc.communicate(stdin_payload, timeout=120)
        except subprocess.TimeoutExpired:
            proc.kill()
            raise
        lines = [json.loads(line) for line in stdout.splitlines() if line.strip()]
        by_id = {msg["id"]: msg for msg in lines}
        assert by_id[1]["result"]["serverInfo"]["name"] == "LeanExploreMCPServer"
        assert len(by_id[2]["result"]["tools"]) == 8
        search_out = json.loads(by_id[3]["result"]["content"][0]["text"])
        assert search_out["results"][0]["name"] == "Nat.add"
        module_out = json.loads(by_id[4]["result"]["content"][0]["text"])
        assert module_out["module"] == "Init.Nat"

    def test_missing_data_exits_1(self, tmp_path):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.pop("JAX_PLATFORMS", None)
        proc = subprocess.run(
            [
                sys.executable,
                "-m",
                "lean_explore_tpu.mcp.server",
                "--backend",
                "local",
                "--data-dir",
                str(tmp_path / "nope"),
            ],
            capture_output=True,
            text=True,
            timeout=60,
        )
        assert proc.returncode == 1
        assert "data fetch" in proc.stderr


class SyncBackend:
    """ApiClient-style duck-typed backend whose methods are coroutines is the
    normal case; the reference ALSO supports plain-sync backends via
    iscoroutine dispatch (mcp/tools.py:128-160). This double returns values
    directly."""

    def __init__(self):
        self.search_calls = []
        self.result = SearchResult(
            id=3, name="Sync.decl", module="Pkg.M", docstring=None,
            source_text="def s", source_link="https://s", dependencies=None,
            informalization=None,
        )

    def search(self, query, limit, rerank_top, packages):
        self.search_calls.append((query, limit, rerank_top, packages))
        return SearchResponse(
            query=query, results=[self.result], count=1, processing_time_ms=1
        )

    def get_by_id(self, declaration_id):
        return self.result if declaration_id == 3 else None


class TestToolsBackendVariants:
    def _with_backend(self, backend):
        from lean_explore_tpu.mcp import app, tools  # noqa: F401

        app.set_backend_service(backend)
        return backend

    def teardown_method(self):
        from lean_explore_tpu.mcp import app

        app._backend_service = None

    def test_sync_backend_search(self):
        from lean_explore_tpu.mcp import tools

        backend = self._with_backend(SyncBackend())
        out = run(tools.search(query="sync"))
        assert out["count"] == 1 and out["results"][0]["name"] == "Sync.decl"
        assert backend.search_calls == [("sync", 10, 50, None)]  # defaults

    def test_sync_backend_field_getter(self):
        from lean_explore_tpu.mcp import tools

        self._with_backend(SyncBackend())
        assert run(tools.get_module(declaration_id=3))["module"] == "Pkg.M"
        assert run(tools.get_module(declaration_id=4)) is None

    def test_parameter_passthrough(self):
        from lean_explore_tpu.mcp import tools

        backend = self._with_backend(SyncBackend())
        run(tools.search(query="q", limit=25, rerank_top=0, packages=["Mathlib"]))
        assert backend.search_calls[-1] == ("q", 25, 0, ["Mathlib"])

    def test_summary_without_informalization_drops_description(self):
        from lean_explore_tpu.mcp import tools

        self._with_backend(SyncBackend())
        out = run(tools.search_summary(query="x"))
        assert out["results"][0] == {"id": 3, "name": "Sync.decl",
                                     "description": None}

    def test_backend_without_search_method(self):
        from lean_explore_tpu.mcp import tools

        self._with_backend(object())
        with pytest.raises(RuntimeError, match="not available"):
            run(tools.search(query="x"))

    def test_backend_without_get_by_id(self):
        from lean_explore_tpu.mcp import tools

        class SearchOnly:
            def search(self, **kw):
                raise AssertionError("unused")

        self._with_backend(SearchOnly())
        with pytest.raises(RuntimeError, match="not available"):
            run(tools.get_docstring(declaration_id=1))

    def test_no_backend_raises_helpful_error(self):
        from lean_explore_tpu.mcp import app, tools

        app._backend_service = None
        with pytest.raises(RuntimeError, match="not initialized"):
            run(tools.search(query="x"))


class TestServerArguments:
    def test_parse_local_backend(self):
        from lean_explore_tpu.mcp.server import _parse_arguments

        args = _parse_arguments(["--backend", "local"])
        assert args.backend == "local" and args.log_level == "ERROR"

    def test_parse_api_with_key_and_level(self):
        from lean_explore_tpu.mcp.server import _parse_arguments

        args = _parse_arguments(
            ["--backend", "api", "--api-key", "k", "--log-level", "DEBUG"]
        )
        assert args.backend == "api" and args.api_key == "k"
        assert args.log_level == "DEBUG"

    def test_missing_backend_exits_2(self):
        from lean_explore_tpu.mcp.server import _parse_arguments

        with pytest.raises(SystemExit) as err:
            _parse_arguments([])
        assert err.value.code == 2

    def test_invalid_backend_exits_2(self):
        from lean_explore_tpu.mcp.server import _parse_arguments

        with pytest.raises(SystemExit) as err:
            _parse_arguments(["--backend", "weird"])
        assert err.value.code == 2

    def test_invalid_log_level_exits_2(self):
        from lean_explore_tpu.mcp.server import _parse_arguments

        with pytest.raises(SystemExit) as err:
            _parse_arguments(["--backend", "local", "--log-level", "LOUD"])
        assert err.value.code == 2

    def test_api_backend_requires_key(self):
        from lean_explore_tpu.mcp.server import _parse_arguments, build_backend

        with pytest.raises(SystemExit) as err:
            build_backend(_parse_arguments(["--backend", "api"]))
        assert err.value.code == 1

    def test_api_backend_builds_client(self):
        from lean_explore_tpu.api import ApiClient
        from lean_explore_tpu.mcp.server import _parse_arguments, build_backend

        backend = build_backend(
            _parse_arguments(["--backend", "api", "--api-key", "secret"])
        )
        assert isinstance(backend, ApiClient)

    def test_local_backend_missing_files_exits_1(self, tmp_path):
        from lean_explore_tpu.mcp.server import _parse_arguments, build_backend

        with pytest.raises(SystemExit) as err:
            build_backend(
                _parse_arguments(
                    ["--backend", "local", "--data-dir", str(tmp_path / "no")]
                )
            )
        assert err.value.code == 1


class TestWarmup:
    def test_service_warmup_compiles_pipeline(self, tmp_path):
        from lean_explore_tpu.index import build_index_artifacts, load_index_artifacts
        from lean_explore_tpu.models import DeclarationStore
        from lean_explore_tpu.search.engine import SearchEngine
        from lean_explore_tpu.search.service import Service
        from tests.conftest import make_declaration
        from tests.search.test_engine import FakeEmbeddingClient, FakeRerankerClient

        store = DeclarationStore(tmp_path / "declarations.db", create=True)
        store.insert_many([make_declaration("Nat.add", "Init.Nat")])
        build_index_artifacts(store, tmp_path)
        service = Service(
            SearchEngine(
                tmp_path,
                store=store,
                artifacts=load_index_artifacts(tmp_path),
                embedding_client=FakeEmbeddingClient(),
                reranker_client=FakeRerankerClient(),
            )
        )
        elapsed = run(service.warmup())
        assert elapsed >= 0
        # Subsequent searches run against the warmed programs.
        resp = run(service.search("Nat.add", rerank_top=0))
        assert resp.count >= 0

    def test_server_warmup_flag_parsed(self):
        from lean_explore_tpu.mcp.server import _parse_arguments

        assert _parse_arguments(["--backend", "local", "--warmup"]).warmup
        assert not _parse_arguments(["--backend", "local"]).warmup
