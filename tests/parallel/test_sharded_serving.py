"""Sharded serving through the PRODUCT path (BASELINE config 5).

One env knob (``LEAN_EXPLORE_MESH_SHAPE`` -> ``Config.MESH_SHAPE``) must turn
multi-chip serving on for the real engine: ``load_index_artifacts`` builds a
``ShardedDenseIndex`` over the configured mesh and ``Service.search_batch``
runs end-to-end against it. The reference has no distributed analogue
(single-process, SURVEY.md §2c); parity target is *equality with the
single-device engine's output* on the same artifacts.

Runs on the virtual 8-device CPU mesh (tests/conftest.py).
"""

import asyncio
import json

import numpy as np
import pytest

from lean_explore_tpu.config import Config
from lean_explore_tpu.index import build_index_artifacts, load_index_artifacts
from lean_explore_tpu.index.dense import DenseIndex
from lean_explore_tpu.models import Declaration, DeclarationStore
from lean_explore_tpu.parallel import ShardedDenseIndex
from lean_explore_tpu.parallel.mesh import serve_mesh_from_config
from lean_explore_tpu.search.engine import SearchEngine
from lean_explore_tpu.search.service import Service

from tests.search.test_engine import FakeEmbeddingClient, FakeRerankerClient

DIM = 16


def run(coro):
    return asyncio.run(coro)


@pytest.fixture(scope="module")
def artifact_dir(tmp_path_factory):
    """Tiny but non-degenerate artifact set: 40 declarations, 32 embedded."""
    path = tmp_path_factory.mktemp("sharded_arts")
    store = DeclarationStore(path / "declarations.db", create=True)
    rng = np.random.default_rng(7)
    decls = []
    for i in range(40):
        has_emb = i < 32
        emb = None
        if has_emb:
            v = rng.standard_normal(DIM).astype(np.float32)
            emb = (v / np.linalg.norm(v)).tolist()
        decls.append(
            Declaration(
                name=f"Pkg{i % 3}.Decl{i}",
                module=f"Pkg{i % 3}.Mod{i % 5}",
                docstring=f"doc {i}",
                source_text=f"def Decl{i} := ...",
                source_link=f"https://github.com/x/{i}",
                dependencies=json.dumps([f"Pkg{(i + 1) % 3}.Decl{(i + 1) % 40}"]),
                informalization=f"**Decl{i}.** informal text number {i}",
                informalization_embedding=emb,
            )
        )
    store.insert_many(decls)
    build_index_artifacts(store, path)
    store.close()
    return path


@pytest.fixture
def mesh_config(monkeypatch):
    """Activate a (2, 4) serving mesh via the Config knob."""
    monkeypatch.setattr(Config, "MESH_SHAPE", "2,4")
    yield


class FakeEmbedder(FakeEmbeddingClient):
    """Deterministic random-direction query embeddings at this corpus DIM."""

    def __init__(self):
        super().__init__()
        self.query_map = {}

    async def embed(self, texts, is_query=False):
        from lean_explore_tpu.util.embedding_client import EmbeddingResponse

        self.calls.append(list(texts))
        embeddings = []
        for t in texts:
            rng = np.random.default_rng(abs(hash(t)) % (2**32))
            v = rng.standard_normal(DIM).astype(np.float32)
            embeddings.append((v / np.linalg.norm(v)).tolist())
        return EmbeddingResponse(
            texts=list(texts), embeddings=embeddings, model="fake"
        )


def make_engine(artifact_dir, mesh=None) -> SearchEngine:
    return SearchEngine(
        artifact_dir,
        store=DeclarationStore(artifact_dir / "declarations.db"),
        artifacts=load_index_artifacts(artifact_dir, mesh=mesh),
        embedding_client=FakeEmbedder(),
        reranker_client=FakeRerankerClient(marker="7"),
    )


class TestConfigWiring:
    def test_no_mesh_by_default(self, artifact_dir):
        arts = load_index_artifacts(artifact_dir)
        assert isinstance(arts.dense, DenseIndex)

    def test_mesh_shape_env_builds_sharded_index(self, artifact_dir, mesh_config):
        mesh = serve_mesh_from_config()
        assert mesh is not None and dict(mesh.shape) == {"data": 2, "corpus": 4}
        arts = load_index_artifacts(artifact_dir)
        assert isinstance(arts.dense, ShardedDenseIndex)
        assert arts.dense.n == 32

    def test_explicit_mesh_overrides(self, artifact_dir):
        from lean_explore_tpu.parallel import SERVE_AXES, make_mesh

        mesh = make_mesh((1, 8), axis_names=SERVE_AXES)
        arts = load_index_artifacts(artifact_dir, mesh=mesh)
        assert isinstance(arts.dense, ShardedDenseIndex)
        assert dict(arts.dense.mesh.shape) == {"data": 1, "corpus": 8}

    def test_int8_sharded_matches_single_device(self, artifact_dir, mesh_config):
        """Int8 serving on the (2,4) mesh returns the single-device int8
        index's results (same row quantization on both paths; the fused
        kernel's provenance packing adds ~6e-5 score noise)."""
        sharded = load_index_artifacts(artifact_dir, dense_dtype="int8")
        assert isinstance(sharded.dense, ShardedDenseIndex)
        assert sharded.dense.method == "fused_int8"
        single = load_index_artifacts(
            artifact_dir, dense_dtype="int8", mesh=False
        )
        assert isinstance(single.dense, DenseIndex)

        rng = np.random.default_rng(3)
        q = rng.standard_normal((5, DIM)).astype(np.float32)
        got_s, got_ids = sharded.dense.search(q, k=10)
        want_s, want_ids = single.dense.search(q, k=10)
        np.testing.assert_array_equal(got_ids, want_ids)
        np.testing.assert_allclose(got_s, want_s, atol=2e-4)

    def test_int8_sharded_row_embeddings_dequantize(
        self, artifact_dir, mesh_config
    ):
        sharded = load_index_artifacts(artifact_dir, dense_dtype="int8")
        single = load_index_artifacts(
            artifact_dir, dense_dtype="int8", mesh=False
        )
        np.testing.assert_allclose(
            sharded.dense.row_embeddings(),
            single.dense.row_embeddings(),
            atol=1e-7,
        )


@pytest.mark.slow
class TestLargeCorpusInt8Sharding:
    """Config-5-scale int8 sharding on the virtual mesh (N >= 600k).

    The small fixtures above prove the sharding logic; this proves the
    int8 fused selection + all-gather merge at the corpus scale the
    BASELINE config-5 row serves (bins/VMEM heuristics in
    parallel/sharded.py:67-72 see their real N). Interpret-mode Pallas on
    the CPU mesh is slow (~4 min), hence the slow marker; the recall
    oracle is a numpy scan over the same dequantized codes.
    """

    def test_int8_sharded_recall_at_600k(self):
        from lean_explore_tpu.ops.quant import quantize_rows
        from lean_explore_tpu.parallel import SERVE_AXES, make_mesh

        N, DIM, K = 600_064, 128, 50
        rng = np.random.default_rng(0)
        mat = rng.standard_normal((N, DIM)).astype(np.float32)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        ids = np.arange(1, N + 1)
        mesh = make_mesh((2, 4), axis_names=SERVE_AXES)
        from lean_explore_tpu.parallel.sharded import ShardedDenseIndex

        index = ShardedDenseIndex(mat, ids, mesh, dtype="int8")
        assert index.method == "fused_int8"

        q = rng.standard_normal((2, DIM)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        got_scores, got_ids = index.search(q, k=K)

        # Oracle: exact scan over the same quantization (selection quality,
        # not quantization quality, is under test here).
        codes, scales = quantize_rows(mat)
        deq = codes.astype(np.float32) * scales[:, None]
        exact = q @ deq.T
        want_rows = np.argsort(-exact, axis=1)[:, :K]
        want_ids = ids[want_rows]
        for b in range(q.shape[0]):
            overlap = len(set(got_ids[b]) & set(want_ids[b])) / K
            assert overlap >= 0.95, overlap
        # Returned scores match the exact inner products of returned rows.
        picked = np.take_along_axis(
            exact, np.asarray(got_ids) - 1, axis=1
        )
        np.testing.assert_allclose(got_scores, picked, atol=2e-3)


class TestShardedEngineParity:
    """Sharded engine output == single-device engine output, bit for bit."""

    QUERIES = [
        "informal text number 7",
        "Decl3",
        "Pkg1 declarations",
        "",  # empty query must stay empty
    ]

    def test_search_batch_equality(self, artifact_dir, mesh_config):
        sharded_engine = make_engine(artifact_dir)
        assert isinstance(sharded_engine._artifacts.dense, ShardedDenseIndex)
        single_engine = make_engine(artifact_dir, mesh=False)
        assert isinstance(single_engine._artifacts.dense, DenseIndex)

        got = run(Service(sharded_engine).search_batch(self.QUERIES, limit=10))
        want = run(Service(single_engine).search_batch(self.QUERIES, limit=10))
        for g, w in zip(got, want):
            assert [r.id for r in g.results] == [r.id for r in w.results]
            assert g.count == w.count

    def test_single_query_service_path(self, artifact_dir, mesh_config):
        engine = make_engine(artifact_dir)
        resp = run(Service(engine).search("informal text number 12"))
        assert resp.count > 0
        assert all(r.name for r in resp.results)

    def test_get_by_id_unaffected(self, artifact_dir, mesh_config):
        engine = make_engine(artifact_dir)
        result = run(engine.get_by_id(1))
        assert result is not None and result.id == 1


class TestMeshEmbedding:
    """Corpus embedding DP over the mesh: outputs must equal single-device."""

    def test_dp_embed_equals_single_device(self, tmp_path):
        from lean_explore_tpu.parallel import SERVE_AXES, make_mesh
        from lean_explore_tpu.util.embedding_client import EmbeddingClient

        from tests.helpers import make_tiny_model_dir

        ckpt = make_tiny_model_dir(tmp_path / "m", with_st_prompt=True)
        texts = [f"nat add {i} the sum of two" for i in range(11)]

        single = EmbeddingClient(str(ckpt), dtype="float32", batch_size=8)
        mesh = make_mesh((8, 1), axis_names=SERVE_AXES)
        sharded = EmbeddingClient(
            str(ckpt), dtype="float32", batch_size=8, mesh=mesh
        )
        want = single.embed_sync(texts, is_query=True)
        got = sharded.embed_sync(texts, is_query=True)
        assert got.shape == want.shape == (11, 64)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_generate_embeddings_uses_mesh_when_configured(
        self, tmp_path, monkeypatch
    ):
        from lean_explore_tpu.extract.embeddings import _embed_mesh

        monkeypatch.setattr(Config, "MESH_SHAPE", "2,4")
        mesh = _embed_mesh()
        assert mesh is not None and mesh.shape["data"] == 8

        monkeypatch.setattr(Config, "MESH_SHAPE", "")
        assert _embed_mesh() is None
