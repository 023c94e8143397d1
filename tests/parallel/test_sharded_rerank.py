"""DP-sharded rerank over the virtual CPU mesh: parity with single-device.

Rerank is the dominant serving stage; parallel/rerank.py shards query
GROUPS over the mesh's data axis with shard_map (params replicated, no
collectives). Parity target: numerically the single-device grouped
path's scores — each shard runs the identical program on its rows.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lean_explore_tpu.models import qwen3  # noqa: E402
from lean_explore_tpu.models.qwen3 import Qwen3Config  # noqa: E402
from lean_explore_tpu.parallel.rerank import (  # noqa: E402
    make_sharded_grouped_scorer,
    rerank_data_mesh,
    replicate_params,
)

TOKEN_TRUE, TOKEN_FALSE = 3, 4


def make_inputs(g=8, d=3, p_len=6, s_len=5, seed=0):
    rng = np.random.default_rng(seed)
    prefix_ids = rng.integers(5, 500, size=(g, p_len)).astype(np.int32)
    prefix_mask = np.ones((g, p_len), dtype=np.int32)
    prefix_mask[1, 4:] = 0
    suffix_ids = rng.integers(5, 500, size=(g, d, s_len)).astype(np.int32)
    suffix_mask = np.ones((g, d, s_len), dtype=np.int32)
    suffix_mask[2, 1, 3:] = 0
    offs = prefix_mask.sum(axis=1).astype(np.int32)
    return prefix_ids, prefix_mask, suffix_ids, suffix_mask, offs


class TestShardedGroupedScorer:
    @pytest.mark.parametrize("n_devices", [2, 4, 8])
    def test_parity_with_single_device(self, n_devices):
        config = Qwen3Config.tiny()
        params = qwen3.init_params(config, jax.random.PRNGKey(0))
        mesh = rerank_data_mesh(devices=jax.devices()[:n_devices])
        p_ids, p_mask, s_ids, s_mask, offs = make_inputs(g=8)

        pk, pv = qwen3.prefix_kv(
            params, config, jnp.asarray(p_ids), jnp.asarray(p_mask)
        )
        want = np.asarray(
            qwen3.rerank_scores_grouped(
                params, config, pk, pv,
                jnp.asarray(p_mask), jnp.asarray(s_ids),
                jnp.asarray(s_mask), jnp.asarray(offs),
                token_true=TOKEN_TRUE, token_false=TOKEN_FALSE,
                group_chunk=8 // n_devices if n_devices < 8 else 1,
            )
        )
        scorer = make_sharded_grouped_scorer(
            config, mesh,
            token_true=TOKEN_TRUE, token_false=TOKEN_FALSE,
            group_chunk=8 // n_devices if n_devices < 8 else 1,
        )
        got = np.asarray(
            scorer(
                replicate_params(params, mesh),
                p_ids, p_mask, s_ids, s_mask, offs,
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_client_mesh_matches_no_mesh(self, tmp_path):
        from lean_explore_tpu.util.reranker_client import RerankerClient

        from tests.helpers import make_tiny_model_dir

        ckpt = make_tiny_model_dir(tmp_path / "m")
        plain = RerankerClient(str(ckpt), model_dir=ckpt, dtype="float32")
        mesh = rerank_data_mesh(devices=jax.devices())
        sharded = RerankerClient(
            str(ckpt), model_dir=ckpt, dtype="float32", mesh=mesh
        )
        queries = ["nat add comm", "list map", "prime numbers", "the sum"]
        docs = [
            ["the sum of two natural numbers", "continuous function map",
             "prime numbers of a b"],
            ["function map of a list", "the sum of two numbers"],
            ["prime numbers of a b", "nat add of two",
             "continuous prime function", "list map function"],
            ["the sum of two", "addition of natural numbers"],
        ]
        want = plain.rerank_grouped_sync(queries, docs)
        got = sharded.rerank_grouped_sync(queries, docs)
        for w_row, g_row in zip(want, got):
            np.testing.assert_allclose(g_row, w_row, atol=1e-5)

    def test_cascade_on_mesh_matches_no_mesh(self, tmp_path):
        """The two-stage cascade composes with DP sharding: both stages run
        through the sharded grouped scorer and match the single-device
        cascade."""
        from lean_explore_tpu.util.reranker_client import RerankerClient

        from tests.helpers import make_tiny_model_dir

        ckpt = make_tiny_model_dir(tmp_path / "m")
        plain = RerankerClient(str(ckpt), model_dir=ckpt, dtype="float32")
        sharded = RerankerClient(
            str(ckpt), model_dir=ckpt, dtype="float32",
            mesh=rerank_data_mesh(devices=jax.devices()),
        )
        queries = ["nat add comm", "list map"]
        docs = [
            ["the sum of two natural numbers and more words here",
             "continuous function map of numbers", "prime numbers of a b",
             "addition of natural numbers the sum"],
            ["function map of a list of many words",
             "the sum of two numbers", "nat add of two",
             "continuous prime function"],
        ]
        want = plain.rerank_grouped_cascade_sync(
            queries, docs, stage1_doc_tokens=4, keep=2
        )
        got = sharded.rerank_grouped_cascade_sync(
            queries, docs, stage1_doc_tokens=4, keep=2
        )
        for w_row, g_row in zip(want, got):
            np.testing.assert_allclose(g_row, w_row, atol=1e-5)

    def test_engine_on_mesh_with_rerank_end_to_end(self, monkeypatch, tmp_path):
        """Service.search_batch with rerank_top>0 on the (2,4) mesh: sharded
        retrieval feeds the DP-sharded reranker; results equal the fully
        single-device engine's on the same artifacts and clients."""
        import asyncio
        import json

        from lean_explore_tpu.config import Config
        from lean_explore_tpu.index import (
            build_index_artifacts,
            load_index_artifacts,
        )
        from lean_explore_tpu.models import Declaration, DeclarationStore
        from lean_explore_tpu.search.engine import SearchEngine
        from lean_explore_tpu.search.service import Service
        from lean_explore_tpu.util.embedding_client import EmbeddingClient
        from lean_explore_tpu.util.reranker_client import RerankerClient

        from tests.helpers import make_tiny_model_dir

        ckpt = make_tiny_model_dir(tmp_path / "m", with_st_prompt=True)
        emb = EmbeddingClient(str(ckpt), dtype="float32")
        store = DeclarationStore(tmp_path / "declarations.db", create=True)
        texts = [
            f"**Fact {i}.** the sum of two natural numbers {i}"
            if i % 2
            else f"**Fact {i}.** continuous function map of a list {i}"
            for i in range(40)
        ]
        store.insert_many(
            [
                Declaration(
                    name=f"Nat.fact{i}",
                    module="Nat.Basic",
                    source_text=f"def f{i} := {i}",
                    source_link=f"https://x/{i}",
                    dependencies=json.dumps([f"Nat.fact{(i + 1) % 40}"]),
                    informalization=texts[i],
                    informalization_embedding=None,
                )
                for i in range(40)
            ]
        )
        vecs = emb.embed_sync(texts)
        store.set_embeddings(
            list(zip(range(1, 41), (v.tolist() for v in vecs)))
        )
        build_index_artifacts(store, tmp_path)

        def run(mesh_on: bool):
            monkeypatch.setattr(
                Config, "MESH_SHAPE", "2,4" if mesh_on else ""
            )
            rr_mesh = rerank_data_mesh() if mesh_on else None
            engine = SearchEngine(
                str(tmp_path),
                store=store,
                artifacts=load_index_artifacts(
                    str(tmp_path), mesh=None if mesh_on else False
                ),
                embedding_client=emb,
                reranker_client=RerankerClient(
                    str(ckpt), model_dir=ckpt, dtype="float32", mesh=rr_mesh
                ),
            )
            return asyncio.run(
                Service(engine).search_batch(
                    ["sum of natural numbers", "continuous map"],
                    limit=5,
                    rerank_top=8,
                )
            )

        got = run(True)
        want = run(False)
        for g, w in zip(got, want):
            assert [r.id for r in g.results] == [r.id for r in w.results]
            assert g.count == w.count > 0

    def test_engine_wires_mesh_when_configured(self, monkeypatch, tmp_path):
        """LEAN_EXPLORE_MESH_SHAPE flips the lazy reranker onto a flat
        data mesh over the serve-mesh devices."""
        from lean_explore_tpu.config import Config
        from lean_explore_tpu.search.engine import SearchEngine

        from tests.helpers import make_tiny_model_dir

        ckpt = make_tiny_model_dir(tmp_path / "m")
        monkeypatch.setattr(Config, "MESH_SHAPE", "2,4")
        engine = SearchEngine.__new__(SearchEngine)
        engine._reranker_client = None
        engine._reranker_model_name = str(ckpt)
        client = engine.reranker_client
        assert client.mesh is not None
        assert client.mesh.shape["data"] == 8

        # The embedder gets the same flat data mesh.
        engine._embedding_client = None
        engine._embedding_model_name = str(ckpt)
        emb = engine.embedding_client
        assert emb.mesh is not None and emb.mesh.shape["data"] == 8
