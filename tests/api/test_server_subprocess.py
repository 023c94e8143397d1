"""Subprocess e2e for `python -m lean_explore_tpu.api.server`.

Drives the real module entry point (artifact discovery, Service
construction, HTTP loop) the way a deployment would — the API-server
analogue of the MCP stdio subprocess e2e (tests/mcp/test_mcp.py).
Lexical-only artifacts (no embeddings) keep the child model-free.
"""

import json
import os
import socket
import subprocess
import sys
import time

import httpx
import pytest

from lean_explore_tpu.index import build_index_artifacts
from lean_explore_tpu.models import DeclarationStore
from tests.conftest import make_declaration

STARTUP_TIMEOUT_S = 90.0


def _free_port() -> int:
    with socket.socket() as sock:
        sock.bind(("127.0.0.1", 0))
        return sock.getsockname()[1]


@pytest.fixture(scope="module")
def server_proc(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("api_server_subproc")
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
    port = _free_port()
    proc = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "lean_explore_tpu.api.server",
            "--data-dir",
            str(tmp_path),
            "--port",
            str(port),
            "--api-key",
            "sekrit",
            "--coalesce-ms",
            "1",
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        env=env,
        text=True,
    )
    base = f"http://127.0.0.1:{port}"
    deadline = time.time() + STARTUP_TIMEOUT_S
    last_error = None
    while time.time() < deadline:
        if proc.poll() is not None:
            _, stderr = proc.communicate(timeout=5)
            raise RuntimeError(f"server died at startup:\n{stderr}")
        try:
            if httpx.get(f"{base}/healthz", timeout=2.0).status_code == 200:
                break
        except httpx.HTTPError as error:
            last_error = error
        time.sleep(0.5)
    else:
        proc.terminate()
        raise RuntimeError(f"server never became healthy: {last_error}")
    try:
        yield base
    finally:
        proc.terminate()
        proc.wait(timeout=10)


AUTH = {"Authorization": "Bearer sekrit"}


class TestSubprocessServer:
    def test_search_over_real_http(self, server_proc):
        response = httpx.get(
            f"{server_proc}/api/v2/search",
            params={"q": "Nat.add", "limit": 2, "rerank_top": 0},
            headers=AUTH,
            timeout=30.0,
        )
        assert response.status_code == 200
        data = response.json()
        assert data["results"][0]["name"] == "Nat.add"
        assert data["count"] >= 1
        assert "processing_time_ms" in data

    def test_get_by_id_and_404(self, server_proc):
        ok = httpx.get(
            f"{server_proc}/api/v2/declarations/1", headers=AUTH, timeout=30.0
        )
        assert ok.status_code == 200 and ok.json()["id"] == 1
        missing = httpx.get(
            f"{server_proc}/api/v2/declarations/424242",
            headers=AUTH,
            timeout=30.0,
        )
        assert missing.status_code == 404

    def test_auth_enforced(self, server_proc):
        response = httpx.get(
            f"{server_proc}/api/v2/search", params={"q": "x"}, timeout=30.0
        )
        assert response.status_code == 401

    def test_bad_request(self, server_proc):
        response = httpx.get(
            f"{server_proc}/api/v2/search", headers=AUTH, timeout=30.0
        )
        assert response.status_code == 400
        assert "q" in response.json()["error"]


class TestMcpOverSelfHostedApi:
    """The complete self-hosted remote stack: MCP stdio server with
    --backend api, whose ApiClient speaks HTTP to OUR api server — the
    deployment the reference can only run against leanexplore.com."""

    def test_mcp_search_round_trips_through_http(self, server_proc):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.pop("JAX_PLATFORMS", None)
        env["LEAN_EXPLORE_API_BASE_URL"] = f"{server_proc}/api/v2"
        proc = subprocess.Popen(
            [
                sys.executable,
                "-m",
                "lean_explore_tpu.mcp.server",
                "--backend",
                "api",
                "--api-key",
                "sekrit",
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
            {
                "jsonrpc": "2.0",
                "id": 2,
                "method": "tools/call",
                "params": {
                    "name": "search",
                    "arguments": {"query": "Nat.add", "limit": 2},
                },
            },
            {
                "jsonrpc": "2.0",
                "id": 3,
                "method": "tools/call",
                "params": {
                    "name": "get_module",
                    "arguments": {"declaration_id": 1},
                },
            },
        ]
        stdin_payload = "".join(json.dumps(m) + "\n" for m in messages)
        try:
            stdout, _ = proc.communicate(stdin_payload, timeout=120)
        except subprocess.TimeoutExpired:
            proc.kill()
            raise
        lines = [json.loads(line) for line in stdout.splitlines() if line.strip()]
        by_id = {msg["id"]: msg for msg in lines if "id" in msg}
        search_out = json.loads(by_id[2]["result"]["content"][0]["text"])
        assert search_out["results"][0]["name"] == "Nat.add"
        module_out = json.loads(by_id[3]["result"]["content"][0]["text"])
        assert module_out["module"] == "Init.Nat"
