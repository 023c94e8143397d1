"""Sharded retrieval on the virtual 8-device CPU mesh vs the numpy oracle."""

import numpy as np
import pytest

from lean_explore_tpu.parallel import ShardedDenseIndex, make_mesh
from tests.conftest import random_unit_rows
from tests.ops.test_dense import numpy_topk


class TestShardedDenseIndex:
    @pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (1, 4)])
    def test_matches_oracle(self, mesh_shape):
        mesh = make_mesh(mesh_shape)
        corpus = random_unit_rows(1000, 32, seed=10)
        queries = random_unit_rows(8, 32, seed=11)
        index = ShardedDenseIndex(corpus, np.arange(1000) + 5, mesh)
        scores, ids = index.search(queries, k=20)
        ref_scores, ref_rows = numpy_topk(queries, corpus, 20)
        np.testing.assert_allclose(scores, ref_scores, atol=1e-5, rtol=1e-5)
        for b in range(8):
            assert set(ids[b]) == set(ref_rows[b] + 5)

    def test_uneven_corpus_padding(self):
        """Corpus rows that don't divide the shard count are padded; padding
        never appears in results."""
        mesh = make_mesh((1, 8))
        corpus = random_unit_rows(103, 16, seed=12)
        index = ShardedDenseIndex(corpus, np.arange(103), mesh)
        scores, ids = index.search(random_unit_rows(3, 16, seed=13), k=50)
        assert ids.max() < 103
        assert np.all(np.isfinite(scores))

    def test_chunked_shard_rows_not_divisible_by_chunk(self):
        """Shard rows that don't divide the chunk size pad INSIDE the
        shard_map body (previously a reshape TypeError at trace time),
        and the pad rows — whose global columns fall inside the NEXT
        shard's range — never pollute results."""
        mesh = make_mesh((1, 2))
        n = 1250  # 625 rows/shard; chunk 400 -> 625 % 400 != 0
        corpus = random_unit_rows(n, 16, seed=40)
        queries = random_unit_rows(4, 16, seed=41)
        index = ShardedDenseIndex(
            corpus, np.arange(n), mesh, chunk=400, method="chunked"
        )
        scores, ids = index.search(queries, k=10)
        ref_scores, ref_rows = numpy_topk(queries, corpus, 10)
        np.testing.assert_allclose(scores, ref_scores, atol=1e-5, rtol=1e-5)
        for b in range(4):
            assert set(ids[b]) == set(ref_rows[b])

    def test_fused_k_above_bins_falls_back_to_exact(self):
        """local_k > the VMEM-capped bin count must degrade to the exact
        per-shard scan (previously ValueError from pallas_bin_topk),
        mirroring ops.dense.dense_topk's k > bins escape."""
        mesh = make_mesh((1, 2))
        n = 2048  # 1024 rows/shard -> bins floor 1024 < k
        corpus = random_unit_rows(n, 16, seed=42)
        queries = random_unit_rows(2, 16, seed=43)
        index = ShardedDenseIndex(
            corpus, np.arange(n), mesh, method="fused"
        )
        k = 1100
        scores, ids = index.search(queries, k=k)
        ref_scores, ref_rows = numpy_topk(queries, corpus, k)
        np.testing.assert_allclose(scores, ref_scores, atol=1e-5, rtol=1e-5)
        for b in range(2):
            assert set(ids[b]) == set(ref_rows[b])

    def test_query_batch_not_divisible_by_data_axis(self):
        mesh = make_mesh((2, 4))
        corpus = random_unit_rows(64, 16, seed=14)
        index = ShardedDenseIndex(corpus, np.arange(64), mesh)
        queries = random_unit_rows(3, 16, seed=15)  # 3 % 2 != 0
        scores, ids = index.search(queries, k=5)
        assert scores.shape == (3, 5)
        ref_scores, ref_rows = numpy_topk(queries, corpus, 5)
        np.testing.assert_allclose(scores, ref_scores, atol=1e-5, rtol=1e-5)

    def test_k_larger_than_shard(self):
        """k above per-shard row count still returns exact global top-k."""
        mesh = make_mesh((1, 8))
        corpus = random_unit_rows(80, 16, seed=16)  # 10 rows per shard
        index = ShardedDenseIndex(corpus, np.arange(80), mesh)
        queries = random_unit_rows(2, 16, seed=17)
        scores, ids = index.search(queries, k=40)
        ref_scores, _ = numpy_topk(queries, corpus, 40)
        np.testing.assert_allclose(scores, ref_scores, atol=1e-5, rtol=1e-5)

    def test_mesh_too_small_raises(self):
        with pytest.raises(ValueError):
            make_mesh((4, 4))  # 16 > 8 virtual devices


class TestApproxSharded:
    def test_approx_matches_oracle_on_cpu(self):
        """On CPU approx_max_k lowers to exact selection, so the sharded
        approx path is oracle-exact in tests."""
        mesh = make_mesh((1, 8))
        corpus = random_unit_rows(800, 32, seed=20)
        index = ShardedDenseIndex(corpus, np.arange(800), mesh, method="approx")
        queries = random_unit_rows(4, 32, seed=21)
        scores, ids = index.search(queries, k=30)
        ref_scores, ref_rows = numpy_topk(queries, corpus, 30)
        np.testing.assert_allclose(scores, ref_scores, atol=1e-5, rtol=1e-5)
        for b in range(4):
            assert set(ids[b]) == set(ref_rows[b])

    def test_approx_k_exceeds_shard_rows(self):
        mesh = make_mesh((1, 8))
        corpus = random_unit_rows(80, 16, seed=22)  # 10 rows/shard < k
        index = ShardedDenseIndex(corpus, np.arange(80), mesh, method="approx")
        scores, ids = index.search(random_unit_rows(2, 16, seed=23), k=40)
        ref_scores, _ = numpy_topk(random_unit_rows(2, 16, seed=23), corpus, 40)
        np.testing.assert_allclose(scores, ref_scores, atol=1e-5, rtol=1e-5)


class TestFusedLocalMethod:
    """The per-shard fused kernel (single-chip serving default) under
    shard_map, interpreter mode, vs the exact oracle."""

    def test_fused_matches_oracle(self):
        from tests.conftest import random_unit_rows

        n, dim, k = 8 * 1024, 32, 50
        corpus = random_unit_rows(n, dim, seed=0)
        queries = random_unit_rows(8, dim, seed=1)
        mesh = make_mesh((2, 4))
        index = ShardedDenseIndex(
            corpus, np.arange(n), mesh, method="fused"
        )
        assert index.embeddings.shape[0] % (4 * 512) == 0
        scores, ids = index.search(queries, k=k)

        exact = queries @ corpus.T
        want_ids = np.argsort(-exact, axis=1)[:, :k]
        # bins >= shard rows here -> per-shard selection is collision-free;
        # packing quantizes scores by ~1e-4.
        for b in range(8):
            overlap = len(set(ids[b]) & set(want_ids[b])) / k
            assert overlap >= 0.98, overlap
        np.testing.assert_allclose(
            scores, np.sort(exact, axis=1)[:, ::-1][:, :k], atol=5e-4
        )

    def test_fused_handles_uneven_padding(self):
        from tests.conftest import random_unit_rows

        n, dim, k = 3000, 32, 20  # pads to 4096 over (1,2) corpus axis
        corpus = random_unit_rows(n, dim, seed=2)
        queries = random_unit_rows(4, dim, seed=3)
        mesh = make_mesh((1, 2))
        index = ShardedDenseIndex(corpus, np.arange(n), mesh, method="fused")
        scores, ids = index.search(queries, k=k)
        assert ids.max() < n
        assert np.all(np.isfinite(scores))

    def test_fused_masks_partial_shard_sentinels(self):
        """A shard whose valid rows < local_k emits packed-zero sentinels
        (unpack to score -3.0, pad-row indices); every such candidate must
        be masked to -inf/offset before the cross-shard merge — masking
        only fully-padded shards left them live, and the approximate TPU
        merge could surface one (wrong id, or ids[idx] out of range)."""
        import jax.numpy as jnp

        from lean_explore_tpu.parallel.sharded import _local_topk_fused

        dim, k = 32, 100
        rows = 512  # one shard's padded block
        valid = 38  # valid rows on this shard << local_k
        shard = np.zeros((rows, dim), dtype=np.float32)
        shard[:valid] = random_unit_rows(valid, dim, seed=44)
        q = jnp.asarray(random_unit_rows(8, dim, seed=45))
        row_offset = 1536  # pretend this is shard 3 of 4
        s, gi = _local_topk_fused(
            q, jnp.asarray(shard), row_offset,
            jnp.int32(row_offset + valid), k=k, recall_target=0.95,
        )
        s, gi = np.asarray(s), np.asarray(gi)
        # Exactly `valid` real candidates per query; the rest -inf.
        finite = np.isfinite(s)
        assert finite.sum(axis=1).tolist() == [valid] * 8
        assert np.all(s[finite] >= -1.0 - 1e-3)  # no -3.0 sentinels
        # Masked candidates clamp to GLOBAL row 0 (shard base can itself
        # exceed n_valid on an all-pad shard), never past valid rows.
        assert np.all(gi[~finite] == 0)
        assert np.all(gi[finite] < row_offset + valid)
