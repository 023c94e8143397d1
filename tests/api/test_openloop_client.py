"""The open-loop bench client must measure real servers correctly.

scripts/http_openloop_client.py is the measurement instrument for the
HTTP-serving benchmark (it exists because an in-process client measured
itself — docs/performance.md "HTTP serving"); an instrument bug would
silently corrupt the committed numbers, so it gets the same end-to-end
treatment as product code: drive it as a subprocess against a local
canned server and check counts, validation, and latency accounting.
"""

import json
import subprocess
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlsplit

REPO = Path(__file__).resolve().parent.parent.parent
CLIENT = REPO / "scripts" / "http_openloop_client.py"


class CannedHandler(BaseHTTPRequestHandler):
    """Returns {"results": [q]} for /api/v2/search?q=...; 'empty' -> []."""

    delay_s = 0.0

    def do_GET(self):
        if self.delay_s:
            time.sleep(self.delay_s)
        query = parse_qs(urlsplit(self.path).query).get("q", [""])[0]
        auth = self.headers.get("Authorization")
        if auth != "Bearer okkey":
            body, status = b'{"error": "unauthorized"}', 401
        else:
            results = [] if query == "empty" else [{"name": query}]
            body, status = json.dumps({"results": results}).encode(), 200
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):
        pass


def run_client(port, queries, tmp_path, api_key="okkey", timeout=60):
    qfile = tmp_path / "queries.txt"
    qfile.write_text("\n".join(queries))
    proc = subprocess.run(
        [
            sys.executable, str(CLIENT),
            f"http://127.0.0.1:{port}/api/v2", str(qfile),
            "--limit", "5", "--api-key", api_key,
        ],
        capture_output=True, text=True, timeout=timeout, cwd=REPO,
    )
    return proc, json.loads(proc.stdout.strip()) if proc.stdout.strip() else None


class TestOpenLoopClient:
    def setup_method(self):
        self.server = ThreadingHTTPServer(("127.0.0.1", 0), CannedHandler)
        self.thread = threading.Thread(
            target=self.server.serve_forever, daemon=True
        )
        self.thread.start()
        self.port = self.server.server_address[1]

    def teardown_method(self):
        self.server.shutdown()
        self.thread.join(timeout=5)
        CannedHandler.delay_s = 0.0

    def test_all_ok(self, tmp_path):
        proc, out = run_client(
            self.port, [f"query {i}" for i in range(8)], tmp_path
        )
        assert proc.returncode == 0, proc.stderr
        assert out["n_requests"] == 8
        assert out["n_ok"] == 8
        assert out["seconds"] > 0
        assert out["latency_ms"]["p50"] <= out["latency_ms"]["max"]

    def test_empty_results_fail_validation(self, tmp_path):
        proc, out = run_client(self.port, ["query", "empty"], tmp_path)
        assert proc.returncode == 1  # one empty result set -> not all ok
        assert out["n_ok"] == 1

    def test_non_200_fails_validation(self, tmp_path):
        proc, out = run_client(
            self.port, ["query"], tmp_path, api_key="wrong"
        )
        assert proc.returncode == 1
        assert out["n_ok"] == 0

    def test_latency_includes_server_time(self, tmp_path):
        CannedHandler.delay_s = 0.2
        proc, out = run_client(self.port, ["q1", "q2"], tmp_path)
        assert proc.returncode == 0, proc.stderr
        # Open loop: both requests in flight concurrently, each >= the
        # server delay but the total far under 2x (serial would be 0.4s+).
        assert out["latency_ms"]["p50"] >= 200
        assert out["seconds"] < 0.45

    def test_dead_server_fails_fast(self, tmp_path):
        """Connection-refused sockets are retired, not spun on: the
        client must report n_ok=0 and exit well before --timeout (the
        pre-fix behavior kept errored sockets registered for
        EVENT_WRITE and busy-looped until the deadline)."""
        # A fresh unused port: bind, grab the number, close the listener.
        import socket

        probe = socket.socket()
        probe.bind(("127.0.0.1", 0))
        dead_port = probe.getsockname()[1]
        probe.close()

        qfile = tmp_path / "queries.txt"
        qfile.write_text("q1\nq2\nq3")
        t0 = time.perf_counter()
        proc = subprocess.run(
            [
                sys.executable, str(CLIENT),
                f"http://127.0.0.1:{dead_port}/api/v2", str(qfile),
                "--limit", "5", "--api-key", "okkey", "--timeout", "30",
            ],
            capture_output=True, text=True, timeout=25, cwd=REPO,
        )
        assert time.perf_counter() - t0 < 10
        assert proc.returncode == 1
        out = json.loads(proc.stdout.strip())
        assert out["n_ok"] == 0
        assert out["latency_ms"] is None  # no connection ever completed
