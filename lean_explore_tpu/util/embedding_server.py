"""HTTP embedding server: POST /api/v2/embed.

First-party counterpart to RemoteEmbeddingClient (the reference ships only
the client side; util/remote_embedding_client.py:45-49). One TPU host can
serve embeddings to many extraction/serving workers:

    python -m lean_explore_tpu.util.embedding_server \
        --model-dir /path/to/Qwen3-Embedding-0.6B --port 8765

Contract:
    POST /api/v2/embed  {"texts": [...], "is_query": bool}
      -> {"embeddings": [[...]], "model": "...", "count": N}
    GET  /healthz       -> {"status": "ok", "model": "..."}

Requests are serialized through a lock: the JAX client batches internally,
and one device pipeline at a time is the throughput-optimal policy on a
single chip.
"""

import argparse
import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

logger = logging.getLogger(__name__)

MAX_TEXTS_PER_REQUEST = 4096
MAX_BODY_BYTES = 64 * 1024 * 1024


def make_handler(client, lock: threading.Lock):
    class EmbeddingHandler(BaseHTTPRequestHandler):
        # HTTP/1.1 keep-alive (all responses carry Content-Length).
        protocol_version = "HTTP/1.1"

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 — http.server API
            if self.path == "/healthz":
                self._send(200, {"status": "ok", "model": client.model_name})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):  # noqa: N802
            if self.path != "/api/v2/embed":
                self._send(404, {"error": "not found"})
                return
            length = int(self.headers.get("Content-Length", 0))
            if length > MAX_BODY_BYTES:
                self._send(413, {"error": "request too large"})
                return
            try:
                payload = json.loads(self.rfile.read(length))
                texts = payload["texts"]
                is_query = bool(payload.get("is_query", False))
                if not isinstance(texts, list) or not all(
                    isinstance(t, str) for t in texts
                ):
                    raise ValueError("texts must be a list of strings")
                if len(texts) > MAX_TEXTS_PER_REQUEST:
                    raise ValueError(
                        f"too many texts ({len(texts)} > {MAX_TEXTS_PER_REQUEST})"
                    )
            except (json.JSONDecodeError, KeyError, ValueError) as error:
                self._send(400, {"error": str(error)})
                return
            try:
                with lock:
                    embeddings = client.embed_sync(texts, is_query=is_query)
            except Exception as error:  # noqa: BLE001 — server boundary
                logger.exception("embed failed")
                self._send(500, {"error": str(error)})
                return
            self._send(
                200,
                {
                    "embeddings": [row.tolist() for row in embeddings],
                    "model": client.model_name,
                    "count": len(texts),
                },
            )

        def log_message(self, fmt, *args):
            logger.info("%s - %s", self.address_string(), fmt % args)

    return EmbeddingHandler


def serve(client, host: str = "127.0.0.1", port: int = 8765) -> ThreadingHTTPServer:
    """Build (but don't start) the server; call serve_forever() on it."""
    handler = make_handler(client, threading.Lock())
    server = ThreadingHTTPServer((host, port), handler)
    logger.info("embedding server on %s:%d (model %s)", host, port, client.model_name)
    return server


def main() -> None:
    from lean_explore_tpu.util.embedding_client import EmbeddingClient
    from lean_explore_tpu.util.logging import setup_logging

    parser = argparse.ArgumentParser(description="Serve embeddings over HTTP.")
    parser.add_argument("--model-dir", required=True)
    parser.add_argument("--model-name", default=None)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8765)
    parser.add_argument("--max-length", type=int, default=512)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()

    setup_logging(args.verbose)
    client = EmbeddingClient(
        args.model_name or args.model_dir,
        model_dir=args.model_dir,
        max_length=args.max_length,
        batch_size=args.batch_size,
        dtype=args.dtype,
    )
    server = serve(client, args.host, args.port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        logger.info("shutting down")
        server.shutdown()


if __name__ == "__main__":
    main()
