"""Embedding HTTP server: real-socket round trip with RemoteEmbeddingClient."""

import threading

import numpy as np
import pytest
import requests

from lean_explore_tpu.util.embedding_server import serve
from lean_explore_tpu.util.remote_embedding_client import RemoteEmbeddingClient
from tests.helpers import make_tiny_model_dir


@pytest.fixture(scope="module")
def running_server(tmp_path_factory):
    from lean_explore_tpu.util import EmbeddingClient

    model_dir = make_tiny_model_dir(tmp_path_factory.mktemp("srv_model"))
    client = EmbeddingClient(str(model_dir), dtype="float32", batch_size=4)
    server = serve(client, host="127.0.0.1", port=0)  # ephemeral port
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base_url = f"http://127.0.0.1:{server.server_address[1]}"
    yield base_url, client
    server.shutdown()


class TestEmbeddingServer:
    def test_healthz(self, running_server):
        base_url, _ = running_server
        response = requests.get(f"{base_url}/healthz", timeout=10)
        assert response.status_code == 200
        assert response.json()["status"] == "ok"

    def test_embed_matches_local(self, running_server):
        base_url, local_client = running_server
        remote = RemoteEmbeddingClient(base_url)
        texts = ["the sum of two natural numbers", "nat add"]
        remote_out = remote.embed_sync(texts, is_query=True)
        local_out = local_client.embed_sync(texts, is_query=True)
        np.testing.assert_allclose(remote_out, local_out, atol=1e-6)

    def test_bad_payloads(self, running_server):
        base_url, _ = running_server
        r = requests.post(f"{base_url}/api/v2/embed", data=b"not json", timeout=10)
        assert r.status_code == 400
        r = requests.post(
            f"{base_url}/api/v2/embed", json={"texts": [1, 2]}, timeout=10
        )
        assert r.status_code == 400
        r = requests.post(f"{base_url}/api/v2/embed", json={}, timeout=10)
        assert r.status_code == 400

    def test_unknown_path(self, running_server):
        base_url, _ = running_server
        assert requests.get(f"{base_url}/nope", timeout=10).status_code == 404
        assert (
            requests.post(f"{base_url}/nope", json={}, timeout=10).status_code
            == 404
        )
