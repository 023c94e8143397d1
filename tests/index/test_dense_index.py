"""DenseIndex + artifact build/load tests (recall@k == 1.0 vs exact oracle)."""

import numpy as np
import pytest

from lean_explore_tpu.index import (
    DenseIndex,
    build_index_artifacts,
    load_index_artifacts,
)
from tests.conftest import make_declaration, random_unit_rows
from tests.ops.test_dense import numpy_topk


class TestDenseIndex:
    def test_search_exact_recall(self):
        corpus = random_unit_rows(500, 64, seed=1)
        ids = np.arange(1000, 1500)
        index = DenseIndex.build(corpus, ids)
        queries = random_unit_rows(8, 64, seed=2)
        scores, got_ids = index.search(queries, k=10)
        _, ref_rows = numpy_topk(corpus[:0].copy() if False else queries, corpus, 10)
        want_ids = ids[ref_rows]
        for b in range(8):
            assert set(got_ids[b]) == set(want_ids[b])
        assert scores.shape == (8, 10)

    def test_batch_dim_bucketing_parity(self):
        """Odd batch sizes pad to BATCH_BUCKETS internally (bounding live
        compiles); results must equal the per-query answers with no
        padding-row leakage."""
        corpus = random_unit_rows(300, 32, seed=7)
        ids = np.arange(300)
        index = DenseIndex.build(corpus, ids)
        for b in (1, 3, 5, 97 % 13):  # off-bucket sizes incl. 1
            queries = random_unit_rows(b, 32, seed=10 + b)
            scores, got_ids = index.search(queries, k=7)
            assert scores.shape == (b, 7) and got_ids.shape == (b, 7)
            for i in range(b):
                s1, id1 = index.search(queries[i : i + 1], k=7)
                np.testing.assert_allclose(scores[i], s1[0], rtol=1e-6)
                np.testing.assert_array_equal(got_ids[i], id1[0])

    def test_query_normalized(self):
        """Unnormalized queries give the same ranking as normalized ones."""
        corpus = random_unit_rows(100, 32, seed=3)
        index = DenseIndex.build(corpus, np.arange(100))
        q = random_unit_rows(2, 32, seed=4)
        _, ids_unit = index.search(q, k=5)
        _, ids_scaled = index.search(q * 7.5, k=5)
        assert np.array_equal(ids_unit, ids_scaled)

    def test_build_normalizes_corpus(self):
        mat = np.array([[3.0, 4.0], [1.0, 0.0]], dtype=np.float32)
        index = DenseIndex.build(mat, np.array([0, 1]))
        host = index.row_embeddings()
        np.testing.assert_allclose(np.linalg.norm(host, axis=1), 1.0, atol=1e-6)

    def test_k_clamped_to_corpus(self):
        corpus = random_unit_rows(5, 16)
        index = DenseIndex.build(corpus, np.arange(5))
        scores, ids = index.search(random_unit_rows(1, 16), k=50)
        assert scores.shape == (1, 5)

    def test_save_load_round_trip(self, tmp_path):
        corpus = random_unit_rows(50, 16, seed=5)
        index = DenseIndex.build(corpus, np.arange(50) + 7)
        index.save(tmp_path)
        loaded = DenseIndex.load(tmp_path)
        q = random_unit_rows(3, 16, seed=6)
        s1, i1 = index.search(q, k=5)
        s2, i2 = loaded.search(q, k=5)
        np.testing.assert_allclose(s1, s2, atol=1e-6)
        assert np.array_equal(i1, i2)

    def test_bf16_load(self, tmp_path):
        corpus = random_unit_rows(50, 16, seed=7)
        DenseIndex.build(corpus, np.arange(50)).save(tmp_path)
        loaded = DenseIndex.load(tmp_path, dtype="bfloat16")
        assert str(loaded.embeddings.dtype) == "bfloat16"
        _, ids = loaded.search(corpus[:3], k=1)
        assert np.array_equal(ids.ravel(), [0, 1, 2])

    def test_missing_artifacts(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            DenseIndex.load(tmp_path)

    def test_shape_validation(self):
        with pytest.raises(ValueError):
            DenseIndex(np.zeros((3, 4), dtype=np.float32), np.arange(2))


class TestArtifacts:
    def _populate(self, store, n=20, dim=8):
        rng = np.random.default_rng(0)
        decls = []
        for i in range(n):
            emb = rng.standard_normal(dim).tolist() if i % 2 == 0 else None
            decls.append(
                make_declaration(
                    name=f"Nat.thing{i}",
                    informalization=f"**Thing {i}.** does thing {i}" if emb else None,
                    embedding=emb,
                )
            )
        store.insert_many(decls)

    def test_build_and_load(self, memory_store, tmp_path):
        self._populate(memory_store)
        manifest = build_index_artifacts(memory_store, tmp_path)
        assert manifest["n_declarations"] == 20
        assert manifest["n_embedded"] == 10
        arts = load_index_artifacts(tmp_path)
        assert arts.dense.n == 10
        assert arts.bm25_spaced.n_docs == 20
        assert arts.bm25_raw.n_docs == 20
        assert len(arts.bm25_ids) == 20
        # Raw index: whole lowercased name is the token
        assert "nat.thing3" in arts.bm25_raw.vocab
        # Spaced index splits the name
        assert "thing3" in arts.bm25_spaced.vocab

    def test_load_incomplete_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_index_artifacts(tmp_path)

    def test_empty_store(self, memory_store, tmp_path):
        manifest = build_index_artifacts(
            memory_store, tmp_path, embedding_dim=8
        )
        assert manifest["n_declarations"] == 0
        arts = load_index_artifacts(tmp_path)
        assert arts.dense.n == 0


class TestInt8Index:
    def test_int8_recall_on_separated_data(self):
        """Quantized search returns the true neighbors when margins exceed
        the ~1% quantization noise."""
        corpus = random_unit_rows(400, 64, seed=30)
        index = DenseIndex.build(corpus, np.arange(400), dtype="int8")
        assert index.scales is not None
        queries = corpus[:8]  # exact corpus rows: unambiguous neighbors
        scores, ids = index.search(queries, k=3)
        assert np.array_equal(ids[:, 0], np.arange(8))
        # Calibrated scores approximate the true inner product (=1.0)
        np.testing.assert_allclose(scores[:, 0], 1.0, atol=0.02)

    def test_int8_oracle_overlap(self):
        from tests.ops.test_dense import numpy_topk

        corpus = random_unit_rows(500, 128, seed=31)
        index = DenseIndex.build(corpus, np.arange(500), dtype="int8")
        queries = random_unit_rows(6, 128, seed=32)
        _, ids = index.search(queries, k=10)
        _, ref = numpy_topk(queries, corpus, 10)
        overlap = np.mean(
            [len(set(ids[b]) & set(ref[b])) / 10 for b in range(6)]
        )
        assert overlap >= 0.8  # int8 noise may swap near-ties

    def test_int8_save_dequantizes(self, tmp_path):
        corpus = random_unit_rows(50, 32, seed=33)
        index = DenseIndex.build(corpus, np.arange(50), dtype="int8")
        index.save(tmp_path)
        reloaded = DenseIndex.load(tmp_path)  # f32
        assert str(reloaded.embeddings.dtype) == "float32"
        # dequantized values within int8 step of the originals
        np.testing.assert_allclose(
            reloaded.row_embeddings(), corpus, atol=1.5 / 127
        )

    def test_int8_load(self, tmp_path):
        corpus = random_unit_rows(50, 32, seed=34)
        DenseIndex.build(corpus, np.arange(50)).save(tmp_path)
        loaded = DenseIndex.load(tmp_path, dtype="int8")
        assert loaded.scales is not None
        _, ids = loaded.search(corpus[:3], k=1)
        assert np.array_equal(ids.ravel(), [0, 1, 2])
