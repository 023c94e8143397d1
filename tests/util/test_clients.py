"""Client-layer tests over tiny real checkpoints (offline)."""

import asyncio

import httpx
import numpy as np
import pytest

from tests.helpers import make_tiny_model_dir


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    return make_tiny_model_dir(
        tmp_path_factory.mktemp("tiny_model"), with_st_prompt=True
    )


@pytest.fixture(scope="module")
def embedding_client(model_dir):
    from lean_explore_tpu.util import EmbeddingClient

    return EmbeddingClient(str(model_dir), dtype="float32", batch_size=4)


@pytest.fixture(scope="module")
def reranker_client(model_dir):
    from lean_explore_tpu.util import RerankerClient

    return RerankerClient(str(model_dir), dtype="float32", batch_size=4)


class TestEmbeddingClient:
    def test_shapes_and_norms(self, embedding_client):
        texts = ["the sum of two natural numbers", "continuous function"]
        out = embedding_client.embed_sync(texts)
        assert out.shape == (2, 64)
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)

    def test_async_response_schema(self, embedding_client):
        resp = asyncio.run(embedding_client.embed(["nat add"], is_query=True))
        assert resp.texts == ["nat add"]
        assert len(resp.embeddings) == 1
        assert len(resp.embeddings[0]) == 64
        assert resp.model == embedding_client.model_name

    def test_query_prompt_changes_embedding(self, embedding_client):
        doc = embedding_client.embed_sync(["nat add"], is_query=False)
        query = embedding_client.embed_sync(["nat add"], is_query=True)
        assert not np.allclose(doc, query)

    def test_reads_st_prompt_config(self, embedding_client):
        assert embedding_client.query_prompt == "query : "

    def test_batch_chunking(self, embedding_client):
        texts = [f"nat add {i}" for i in range(11)]  # > batch_size=4
        out = embedding_client.embed_sync(texts)
        assert out.shape == (11, 64)
        single = embedding_client.embed_sync([texts[7]])
        np.testing.assert_allclose(out[7], single[0], atol=1e-5)

    def test_empty(self, embedding_client):
        assert embedding_client.embed_sync([]).shape == (0, 64)

    def test_determinism(self, embedding_client):
        a = embedding_client.embed_sync(["prime numbers"])
        b = embedding_client.embed_sync(["prime numbers"])
        np.testing.assert_array_equal(a, b)

    def test_missing_model_raises(self):
        from lean_explore_tpu.util import EmbeddingClient

        with pytest.raises(FileNotFoundError):
            EmbeddingClient("Does/Not-Exist")


class TestRerankerClient:
    def test_scores_bounded_and_aligned(self, reranker_client):
        docs = ["nat add : addition", "list map : applies a function", "prime"]
        resp = reranker_client.rerank_sync("addition of numbers", docs)
        assert len(resp.scores) == 3
        assert all(0.0 <= s <= 1.0 for s in resp.scores)
        assert resp.query == "addition of numbers"

    def test_empty_docs(self, reranker_client):
        resp = reranker_client.rerank_sync("q", [])
        assert resp.scores == []

    def test_async_matches_sync(self, reranker_client):
        docs = [f"document {i} nat add" for i in range(9)]  # spans batches
        sync = reranker_client.rerank_sync("nat add", docs)
        async_resp = asyncio.run(reranker_client.rerank("nat add", docs))
        np.testing.assert_allclose(async_resp.scores, sync.scores, atol=1e-6)

    def test_matches_direct_model_call(self, reranker_client, model_dir):
        import jax.numpy as jnp

        from lean_explore_tpu.models import qwen3
        from lean_explore_tpu.models.tokenizer import encode_batch

        docs = ["nat add"]
        resp = reranker_client.rerank_sync("sum", docs)
        pair = reranker_client._format_pair("sum", "nat add")
        batch = encode_batch(reranker_client.tokenizer, [pair], max_length=512)
        want = qwen3.rerank_scores(
            reranker_client.params,
            reranker_client.config,
            jnp.asarray(batch.input_ids),
            jnp.asarray(batch.attention_mask),
            token_true=reranker_client.token_true_id,
            token_false=reranker_client.token_false_id,
        )
        np.testing.assert_allclose(resp.scores[0], float(want[0]), atol=1e-6)


class TestRerankerPrefixKV:
    """Shared-prefix KV reuse must score identically to the flat path."""

    def test_grouped_matches_flat(self, reranker_client):
        queries = ["addition of natural numbers", "topology open sets", "x"]
        docs_grouped = [
            [
                "Nat.add: the sum of two natural numbers",
                "Nat.mul: the product",
                "List.map: applies a function to every element of a list",
            ],
            ["IsOpen: a set is open", "Continuous: preimages of opens"],
            ["single document only"],
        ]
        grouped = reranker_client.rerank_grouped_sync(queries, docs_grouped)
        for q, docs, scores in zip(queries, docs_grouped, grouped):
            flat = reranker_client.rerank_pairs_sync([q] * len(docs), docs)
            np.testing.assert_allclose(scores, flat, atol=1e-4)

    def test_empty_group_and_alignment(self, reranker_client):
        grouped = reranker_client.rerank_grouped_sync(
            ["a", "b"], [[], ["doc one", "doc two"]]
        )
        assert grouped[0] == []
        assert len(grouped[1]) == 2

    def test_identical_documents_share_full_prefix(self, reranker_client):
        """Identical docs make the common token prefix the whole sequence;
        the min(len)-1 cap must leave >=1 suffix token and still score
        identically to the flat path."""
        docs = ["same document text"] * 4
        grouped = reranker_client.rerank_grouped_sync(["a query"], [docs])
        flat = reranker_client.rerank_pairs_sync(["a query"] * 4, docs)
        np.testing.assert_allclose(grouped[0], flat, atol=1e-4)
        assert len(set(round(s, 6) for s in grouped[0])) == 1

    def test_truncation_boundary(self, reranker_client):
        """Documents long enough to truncate at max_length still split/score
        consistently with the flat path."""
        long_doc = "word " * 2000  # far beyond max_length tokens
        docs = [long_doc, "short doc", long_doc + "tail"]
        grouped = reranker_client.rerank_grouped_sync(["q text"], [docs])
        flat = reranker_client.rerank_pairs_sync(["q text"] * 3, docs)
        np.testing.assert_allclose(grouped[0], flat, atol=1e-4)

    def test_env_disable_falls_back(self, reranker_client, monkeypatch):
        monkeypatch.setenv("LEAN_EXPLORE_RERANK_PREFIX", "0")
        grouped = reranker_client.rerank_grouped_sync(
            ["sum of numbers"], [["Nat.add: addition", "prime numbers"]]
        )
        flat = reranker_client.rerank_pairs_sync(
            ["sum of numbers"] * 2, ["Nat.add: addition", "prime numbers"]
        )
        np.testing.assert_allclose(grouped[0], flat, atol=1e-6)

    def test_model_level_exactness(self, reranker_client):
        """Grouped forward == full-sequence forward on constructed tokens."""
        import jax.numpy as jnp

        from lean_explore_tpu.models import qwen3

        params, config = reranker_client.params, reranker_client.config
        rng = np.random.default_rng(0)
        g, d, p_len, s_len = 2, 3, 5, 4
        vocab = config.vocab_size
        prefix = rng.integers(1, vocab, size=(g, p_len)).astype(np.int32)
        suffix = rng.integers(1, vocab, size=(g, d, s_len)).astype(np.int32)
        # Ragged suffix validity: doc di in group gi has s_len - di tokens.
        suffix_mask = np.zeros((g, d, s_len), dtype=np.int32)
        for gi in range(g):
            for di in range(d):
                suffix_mask[gi, di, : s_len - di] = 1
        prefix_mask = np.ones((g, p_len), dtype=np.int32)

        pk, pv = qwen3.prefix_kv(
            params, config, jnp.asarray(prefix), jnp.asarray(prefix_mask)
        )
        # group_chunk=1 and 2 exercise both the single-group and the
        # multi-group-per-step (broadcast over the chunk axis) layouts.
        by_chunk = {}
        for chunk in (1, 2):
            by_chunk[chunk] = np.asarray(
                qwen3.rerank_scores_grouped(
                    params,
                    config,
                    pk,
                    pv,
                    jnp.asarray(prefix_mask),
                    jnp.asarray(suffix),
                    jnp.asarray(suffix_mask),
                    jnp.asarray(np.full((g,), p_len, dtype=np.int32)),
                    token_true=reranker_client.token_true_id,
                    token_false=reranker_client.token_false_id,
                    group_chunk=chunk,
                )
            )

        for gi in range(g):
            for di in range(d):
                n_sfx = int(suffix_mask[gi, di].sum())
                full = np.concatenate([prefix[gi], suffix[gi, di, :n_sfx]])
                ids = full[None, :].astype(np.int32)
                mask = np.ones_like(ids)
                want = float(
                    qwen3.rerank_scores(
                        params,
                        config,
                        jnp.asarray(ids),
                        jnp.asarray(mask),
                        token_true=reranker_client.token_true_id,
                        token_false=reranker_client.token_false_id,
                    )[0]
                )
                for chunk in (1, 2):
                    np.testing.assert_allclose(
                        by_chunk[chunk][gi, di], want, atol=1e-5
                    )


class TestRemoteEmbeddingClient:
    def test_post_contract(self, monkeypatch):
        from lean_explore_tpu.util import RemoteEmbeddingClient

        captured = {}

        class FakeResponse:
            def raise_for_status(self):
                pass

            def json(self):
                return {"embeddings": [[0.1, 0.2]]}

        def fake_post(url, json=None, timeout=None):
            captured["url"] = url
            captured["json"] = json
            return FakeResponse()

        monkeypatch.setattr("requests.post", fake_post)
        client = RemoteEmbeddingClient("http://host:9000/")
        out = client.embed_sync(["hello"], is_query=True)
        assert captured["url"] == "http://host:9000/api/v2/embed"
        assert captured["json"] == {"texts": ["hello"], "is_query": True}
        np.testing.assert_allclose(out, [[0.1, 0.2]], atol=1e-7)


class TestOpenRouterClient:
    def _client(self, handler):
        from lean_explore_tpu.util import OpenRouterClient

        return OpenRouterClient(
            api_key="test-key", transport=httpx.MockTransport(handler)
        )

    def test_generate(self):
        def handler(request: httpx.Request) -> httpx.Response:
            assert request.headers["Authorization"] == "Bearer test-key"
            assert request.url.path.endswith("/chat/completions")
            return httpx.Response(
                200,
                json={"choices": [{"message": {"content": "**Nat.add.** adds"}}]},
            )

        client = self._client(handler)
        out = asyncio.run(client.generate("describe Nat.add", model="test/model"))
        assert out == "**Nat.add.** adds"

    def test_retries_then_succeeds(self):
        calls = {"n": 0}

        def handler(request: httpx.Request) -> httpx.Response:
            calls["n"] += 1
            if calls["n"] < 3:
                return httpx.Response(500, json={"error": "boom"})
            return httpx.Response(
                200, json={"choices": [{"message": {"content": "ok"}}]}
            )

        client = self._client(handler)
        out = asyncio.run(client.generate("p", model="m"))
        assert out == "ok"
        assert calls["n"] == 3

    def test_no_key_raises(self, monkeypatch):
        from lean_explore_tpu.util import OpenRouterClient

        monkeypatch.delenv("OPENROUTER_API_KEY", raising=False)
        with pytest.raises(ValueError):
            OpenRouterClient()


class TestProfiling:
    def test_stage_timings(self):
        from lean_explore_tpu.util import StageTimings

        t = StageTimings()
        with t.stage("encode"):
            pass
        with t.stage("dense"):
            pass
        assert set(t.as_dict()) == {"encode", "dense"}
        assert t.total_ms() >= 0


class TestRerankPairs:
    def test_pairs_order_preserved_with_mixed_lengths(self, reranker_client):
        """Length-sorted batching must return scores in input order."""
        queries = ["sum"] * 6
        docs = [
            "nat add",
            "the sum of two natural numbers " * 6,
            "list",
            "multiplication of two natural numbers and more words here",
            "a",
            "prime numbers " * 3,
        ]
        batched = reranker_client.rerank_pairs_sync(queries, docs)
        singles = [
            reranker_client.rerank_sync("sum", [d]).scores[0] for d in docs
        ]
        import numpy as np

        np.testing.assert_allclose(batched, singles, atol=1e-5)

    def test_pairs_length_mismatch(self, reranker_client):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            reranker_client.rerank_pairs_sync(["a"], ["x", "y"])

    def test_pairs_empty(self, reranker_client):
        assert reranker_client.rerank_pairs_sync([], []) == []
