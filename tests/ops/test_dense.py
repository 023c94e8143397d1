"""Dense top-k retrieval: every method vs a numpy exact-search oracle.

The oracle plays the role the reference's own index tests give
faiss.IndexFlatIP (reference tests/extract/index_test.py:156-409): exact
inner-product search on small random corpora.
"""

import numpy as np
import pytest

from lean_explore_tpu.ops import dense_topk, l2_normalize, pad_rows
from tests.conftest import random_unit_rows


def numpy_topk(queries: np.ndarray, corpus: np.ndarray, k: int):
    """Exact inner-product top-k oracle (descending)."""
    scores = queries.astype(np.float64) @ corpus.astype(np.float64).T
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


def assert_topk_matches(scores, idx, ref_scores, ref_idx, atol=1e-5):
    """Score-level equality; id sets must agree up to ties at the k-th score."""
    scores = np.asarray(scores, dtype=np.float64)
    np.testing.assert_allclose(scores, ref_scores, atol=atol, rtol=1e-5)
    for b in range(scores.shape[0]):
        got, want = set(np.asarray(idx)[b]), set(ref_idx[b])
        disagreement = got.symmetric_difference(want)
        if disagreement:
            # Only tied boundary scores may differ in id.
            kth = ref_scores[b, -1]
            corpus_scores = {i: ref_scores[b][list(ref_idx[b]).index(i)]
                             for i in want if i in disagreement and i in want}
            for s in corpus_scores.values():
                assert abs(s - kth) < atol


METHODS = ["full", "chunked", "windowed", "approx"]


class TestDenseTopK:
    @pytest.mark.parametrize("method", METHODS)
    @pytest.mark.parametrize("n,b,k", [(500, 4, 10), (3000, 16, 100), (257, 1, 7)])
    def test_matches_oracle(self, method, n, b, k):
        corpus = random_unit_rows(n, 64, seed=n)
        queries = random_unit_rows(b, 64, seed=n + 1)
        scores, idx = dense_topk(
            queries, corpus, k, method=method, chunk=256, window=8
        )
        ref_scores, ref_idx = numpy_topk(queries, corpus, k)
        assert_topk_matches(scores, idx, ref_scores, ref_idx)

    @pytest.mark.parametrize("method", METHODS)
    def test_padding_never_selected(self, method):
        """Corpus rows are padded with zeros; zero scores must not leak in
        when all real scores are negative."""
        rng = np.random.default_rng(3)
        corpus = -np.abs(rng.standard_normal((100, 32))).astype(np.float32)
        corpus = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
        queries = np.abs(rng.standard_normal((2, 32))).astype(np.float32)
        scores, idx = dense_topk(
            queries, corpus, 50, method=method, chunk=64, window=8
        )
        assert np.asarray(idx).max() < 100
        assert np.all(np.asarray(scores) < 0)

    def test_k_too_large_raises(self):
        corpus = random_unit_rows(10, 16)
        queries = random_unit_rows(1, 16)
        with pytest.raises(ValueError):
            dense_topk(queries, corpus, 11)

    def test_auto_method(self):
        corpus = random_unit_rows(200, 32)
        queries = random_unit_rows(3, 32)
        scores, idx = dense_topk(queries, corpus, 5)
        ref_scores, ref_idx = numpy_topk(queries, corpus, 5)
        assert_topk_matches(scores, idx, ref_scores, ref_idx)

    def test_bf16_corpus(self):
        """bfloat16 corpus: same neighbor sets on well-separated data."""
        import jax.numpy as jnp

        corpus = random_unit_rows(400, 128, seed=11)
        queries = corpus[:4] + 0.01 * random_unit_rows(4, 128, seed=12)
        scores, idx = dense_topk(
            jnp.asarray(queries), jnp.asarray(corpus, dtype=jnp.bfloat16), 1
        )
        assert np.array_equal(np.asarray(idx).ravel(), np.arange(4))

    def test_scores_descending(self):
        corpus = random_unit_rows(300, 32, seed=5)
        queries = random_unit_rows(8, 32, seed=6)
        scores, _ = dense_topk(queries, corpus, 20, method="chunked", chunk=128)
        s = np.asarray(scores)
        assert np.all(np.diff(s, axis=1) <= 1e-7)


class TestHelpers:
    def test_l2_normalize(self):
        x = np.array([[3.0, 4.0], [0.0, 0.0]], dtype=np.float32)
        out = np.asarray(l2_normalize(x))
        np.testing.assert_allclose(out[0], [0.6, 0.8], atol=1e-6)
        np.testing.assert_allclose(out[1], [0.0, 0.0], atol=1e-6)

    def test_pad_rows(self):
        x = np.ones((5, 3), dtype=np.float32)
        padded, n = pad_rows(x, 4)
        assert padded.shape == (8, 3)
        assert n == 5
        assert np.all(np.asarray(padded)[5:] == 0)

    def test_pad_rows_noop(self):
        x = np.ones((8, 3), dtype=np.float32)
        padded, n = pad_rows(x, 4)
        assert padded.shape == (8, 3)


class TestPallasKernel:
    """Interpreter-mode checks of the fused kernel (real-TPU runs in bench)."""

    @pytest.mark.parametrize("n,b,k,window", [(512, 8, 16, 8), (2048, 4, 64, 16)])
    def test_matches_oracle(self, n, b, k, window):
        import jax.numpy as jnp

        from lean_explore_tpu.ops.pallas_retrieval import pallas_windowed_topk

        corpus = random_unit_rows(n, 128, seed=n)
        queries = random_unit_rows(b, 128, seed=n + 1)
        scores, idx = pallas_windowed_topk(
            jnp.asarray(queries),
            jnp.asarray(corpus),
            n_valid=jnp.int32(n),
            k=k,
            window=window,
            tile_rows=256,
            interpret=True,
        )
        ref_scores, ref_idx = numpy_topk(queries, corpus, k)
        assert_topk_matches(scores, idx, ref_scores, ref_idx)

    def test_masks_padding(self):
        import jax.numpy as jnp

        from lean_explore_tpu.ops.pallas_retrieval import fused_scores_wmax

        corpus = np.zeros((256, 128), dtype=np.float32)
        corpus[:100] = random_unit_rows(100, 128, seed=9)
        queries = random_unit_rows(2, 128, seed=10)
        scores_t, wmax_t = fused_scores_wmax(
            jnp.asarray(queries),
            jnp.asarray(corpus),
            jnp.int32(100),
            window=8,
            tile_rows=128,
            interpret=True,
        )
        st = np.asarray(scores_t)
        assert np.all(np.isneginf(st[100:]))
        assert np.all(np.isfinite(st[:100]))
        # window maxima for fully-padded windows are -inf
        wm = np.asarray(wmax_t)
        assert np.all(np.isneginf(wm[13:]))  # windows beyond ceil(100/8)=13


class TestPallasBinTopK:
    """Interpreter-mode checks of the fused bin-max selection kernel.

    Real-TPU throughput/recall runs in bench.py (BENCH_METHOD=fused)."""

    def _run(self, corpus, queries, n_valid, k, **kw):
        import jax.numpy as jnp

        from lean_explore_tpu.ops.pallas_retrieval import pallas_bin_topk

        return pallas_bin_topk(
            jnp.asarray(queries),
            jnp.asarray(corpus),
            jnp.int32(n_valid),
            k=k,
            interpret=True,
            **kw,
        )

    @pytest.mark.parametrize("n,b,k", [(512, 8, 16), (1024, 4, 64)])
    def test_exact_when_bins_cover_corpus(self, n, b, k):
        """bins >= n: every row has its own bin, selection is exact."""
        corpus = random_unit_rows(n, 128, seed=n)
        queries = random_unit_rows(b, 128, seed=n + 1)
        scores, idx = self._run(
            corpus, queries, n, k,
            bins=1024, tile_rows=256, exact_epilogue=True,
        )
        ref_scores, ref_idx = numpy_topk(queries, corpus, k)
        # Scores carry the provenance-packing quantization (~1e-4 max here).
        assert_topk_matches(scores, idx, ref_scores, ref_idx, atol=5e-4)

    def test_unnormalized_scores_below_minus3_degrade_safely(self):
        """Raw inner products <= -3 (unnormalized inputs violate the
        packing precondition) must NOT invert the bit ordering: they clamp
        to bottom-ranked ties with REAL row indices, and candidates above
        -3 still rank exactly."""
        n, dim, k = 512, 32, 8
        corpus = np.zeros((n, dim), dtype=np.float32)
        q = np.zeros((4, dim), dtype=np.float32)
        q[:, 0] = 1.0
        corpus[:, 0] = -5.0  # score -5 for every row: below the -3 floor
        winners = [7, 130, 300]
        for rank, row in enumerate(winners):
            corpus[row, 0] = 0.9 - 0.1 * rank  # 0.9, 0.8, 0.7
        scores, idx = self._run(
            corpus, q, n, k, bins=256, tile_rows=128, exact_epilogue=True,
        )
        scores, idx = np.asarray(scores), np.asarray(idx)
        # The three positive rows rank first with true scores ...
        assert idx[0, :3].tolist() == winners
        np.testing.assert_allclose(scores[0, :3], [0.9, 0.8, 0.7], atol=5e-4)
        # ... and the sub--3 tail ties at the floor with VALID indices
        # (previously the zero carry beat them and fabricated indices).
        assert np.all(scores[0, 3:] <= -2.99)
        assert np.all((idx >= 0) & (idx < n))

    def test_provenance_invariant(self):
        """Every returned (row, score) pair must be genuine — the score IS
        the inner product of that corpus row (up to the documented packing
        quantization), approximate or not."""
        n, b, k = 2048, 4, 32
        corpus = random_unit_rows(n, 64, seed=1)
        queries = random_unit_rows(b, 64, seed=2)
        scores, idx = self._run(
            corpus, queries, n, k, bins=512, tile_rows=256
        )
        scores, idx = np.asarray(scores), np.asarray(idx)
        assert idx.min() >= 0 and idx.max() < n
        for q in range(b):
            want = queries[q] @ corpus[idx[q]].T
            np.testing.assert_allclose(scores[q], want, atol=5e-4)
        # descending order
        assert np.all(np.diff(scores, axis=1) <= 1e-6)

    def test_recall_with_collisions(self):
        """bins < n loses only bin-colliding candidates: recall@10 == 1.0 and
        recall@k stays near the bin-survivorship expectation."""
        n, b, k, bins = 4096, 8, 128, 1024
        corpus = random_unit_rows(n, 64, seed=3)
        queries = random_unit_rows(b, 64, seed=4)
        scores, idx = self._run(
            corpus, queries, n, k, bins=bins, tile_rows=256, exact_epilogue=True
        )
        _, ref_idx = numpy_topk(queries, corpus, k)
        idx = np.asarray(idx)
        recall10 = np.mean(
            [len(set(idx[q][:10]) & set(ref_idx[q][:10])) / 10 for q in range(b)]
        )
        recallk = np.mean(
            [len(set(idx[q]) & set(ref_idx[q])) / k for q in range(b)]
        )
        assert recall10 == 1.0
        # survivorship expectation: (bins/k)(1 - exp(-k/bins)) ~ 0.94
        assert recallk > 0.85

    def test_partial_final_supertile(self):
        """n % bins != 0 with n // bins a power of two: the last partial
        super-tile carries id n//bins, which overflowed the stolen mantissa
        bits when the count was computed with floor division (wrong indices
        AND corrupted scores for winners in that super-tile)."""
        n, b, k, bins = 2560, 4, 32, 1024
        corpus = random_unit_rows(n, 64, seed=40)
        queries = random_unit_rows(b, 64, seed=41)
        # Plant the global winner deep inside the final partial super-tile.
        corpus[2300] = queries[0]
        scores, idx = self._run(
            corpus, queries, n, k, bins=bins, tile_rows=512,
            exact_epilogue=True,
        )
        scores, idx = np.asarray(scores), np.asarray(idx)
        assert idx[0, 0] == 2300
        np.testing.assert_allclose(scores[0, 0], 1.0, atol=5e-4)
        # Provenance invariant over the whole pool.
        assert idx.min() >= 0 and idx.max() < n
        for q in range(b):
            want = queries[q] @ corpus[idx[q]].T
            np.testing.assert_allclose(scores[q], want, atol=5e-4)

    def test_masks_padding(self):
        corpus = np.zeros((512, 64), dtype=np.float32)
        corpus[:300] = random_unit_rows(300, 64, seed=5)
        queries = random_unit_rows(2, 64, seed=6)
        scores, idx = self._run(
            corpus, queries, 300, 16, bins=512, tile_rows=256,
            exact_epilogue=True,
        )
        assert np.asarray(idx).max() < 300
        assert np.all(np.isfinite(np.asarray(scores)))

    def test_dense_topk_fused_dispatch(self):
        corpus = random_unit_rows(700, 64, seed=7)
        queries = random_unit_rows(3, 64, seed=8)
        scores, idx = dense_topk(queries, corpus, 20, method="fused")
        ref_scores, ref_idx = numpy_topk(queries, corpus, 20)
        # bins (1024) >= padded n (1024) here, epilogue approx==exact on CPU
        assert_topk_matches(scores, idx, ref_scores, ref_idx)

    def test_k_exceeding_bins_falls_back_to_full(self):
        corpus = random_unit_rows(300, 64, seed=9)
        queries = random_unit_rows(2, 64, seed=10)
        scores, idx = dense_topk(queries, corpus, 280, method="fused")
        ref_scores, ref_idx = numpy_topk(queries, corpus, 280)
        assert_topk_matches(scores, idx, ref_scores, ref_idx)


class TestPallasBinTopKInt8:
    """Interpreter-mode checks of the int8 fused kernel."""

    def test_matches_quantized_exact(self):
        import jax.numpy as jnp

        from lean_explore_tpu.ops.pallas_retrieval import pallas_bin_topk_int8
        from lean_explore_tpu.ops.quant import quantize_rows, quantized_topk

        n, b, k = 1024, 4, 32
        corpus = random_unit_rows(n, 64, seed=20)
        queries = random_unit_rows(b, 64, seed=21)
        codes, scales = quantize_rows(corpus)

        got_scores, got_idx = pallas_bin_topk_int8(
            jnp.asarray(queries),
            jnp.asarray(codes),
            jnp.asarray(scales),
            jnp.int32(n),
            k=k,
            bins=1024,  # bins >= n: collision-free
            tile_rows=256,
            exact_epilogue=True,
            interpret=True,
        )
        want_scores, want_idx = quantized_topk(
            jnp.asarray(queries),
            jnp.asarray(codes),
            jnp.asarray(scales),
            jnp.int32(n),
            k=k,
            exact=True,
        )
        # Same quantized inner products up to the packing quantum.
        np.testing.assert_allclose(
            np.asarray(got_scores), np.asarray(want_scores), atol=5e-4
        )
        overlap = np.mean(
            [
                len(set(np.asarray(got_idx)[q]) & set(np.asarray(want_idx)[q])) / k
                for q in range(b)
            ]
        )
        assert overlap >= 0.95  # packing may swap near-exact ties

    def test_partial_final_supertile_int8(self):
        """Int8 twin of the steal-bits overflow regression (n=2560,
        bins=1024: final super-tile id 2 needs 2 stolen bits)."""
        import jax.numpy as jnp

        from lean_explore_tpu.ops.pallas_retrieval import pallas_bin_topk_int8
        from lean_explore_tpu.ops.quant import quantize_rows

        n, b, k = 2560, 3, 16
        corpus = random_unit_rows(n, 64, seed=42)
        queries = random_unit_rows(b, 64, seed=43)
        corpus[2300] = queries[0]
        codes, scales = quantize_rows(corpus)
        scores, idx = pallas_bin_topk_int8(
            jnp.asarray(queries), jnp.asarray(codes), jnp.asarray(scales),
            jnp.int32(n), k=k, bins=1024, tile_rows=512,
            exact_epilogue=True, interpret=True,
        )
        scores, idx = np.asarray(scores), np.asarray(idx)
        assert idx[0, 0] == 2300
        assert idx.min() >= 0 and idx.max() < n
        deq = codes.astype(np.float32) * scales[:, None]
        q_abs = np.abs(queries).max(axis=1)
        q_scales = np.where(q_abs > 0, q_abs / 127.0, 1.0)
        q_codes = np.clip(np.rint(queries / q_scales[:, None]), -127, 127)
        for q in range(b):
            want = (q_codes[q] * q_scales[q]) @ deq[idx[q]].T
            np.testing.assert_allclose(scores[q], want, atol=5e-4)

    def test_provenance_invariant(self):
        import jax.numpy as jnp

        from lean_explore_tpu.ops.pallas_retrieval import pallas_bin_topk_int8
        from lean_explore_tpu.ops.quant import quantize_rows

        n, b, k = 2048, 3, 16
        corpus = random_unit_rows(n, 64, seed=22)
        queries = random_unit_rows(b, 64, seed=23)
        codes, scales = quantize_rows(corpus)
        scores, idx = pallas_bin_topk_int8(
            jnp.asarray(queries),
            jnp.asarray(codes),
            jnp.asarray(scales),
            jnp.int32(n),
            k=k,
            bins=512,
            tile_rows=256,
            interpret=True,
        )
        scores, idx = np.asarray(scores), np.asarray(idx)
        assert idx.min() >= 0 and idx.max() < n
        # Scores must equal the calibrated int8 inner product of that row.
        deq = codes.astype(np.float32) * scales[:, None]
        q_abs = np.abs(queries).max(axis=1)
        q_scales = np.where(q_abs > 0, q_abs / 127.0, 1.0)
        q_codes = np.clip(np.rint(queries / q_scales[:, None]), -127, 127)
        for q in range(b):
            want = (q_codes[q] * q_scales[q]) @ deq[idx[q]].T
            np.testing.assert_allclose(scores[q], want, atol=5e-4)


class TestSingleQueryBatch:
    """B=1 regression: tiny batches trip a Mosaic matvec-lowering bug on
    hardware; the wrappers pad the batch to 8 and slice back."""

    def test_bin_topk_b1(self):
        import jax.numpy as jnp

        from lean_explore_tpu.ops.pallas_retrieval import pallas_bin_topk

        corpus = random_unit_rows(1024, 64, seed=30)
        queries = random_unit_rows(1, 64, seed=31)
        scores, idx = pallas_bin_topk(
            jnp.asarray(queries), jnp.asarray(corpus), jnp.int32(1024),
            k=10, bins=1024, tile_rows=256, exact_epilogue=True,
            interpret=True,
        )
        assert scores.shape == (1, 10) and idx.shape == (1, 10)
        ref_scores, ref_idx = numpy_topk(queries, corpus, 10)
        assert_topk_matches(scores, idx, ref_scores, ref_idx, atol=5e-4)

    def test_bin_topk_int8_b1(self):
        import jax.numpy as jnp

        from lean_explore_tpu.ops.pallas_retrieval import pallas_bin_topk_int8
        from lean_explore_tpu.ops.quant import quantize_rows

        corpus = random_unit_rows(512, 64, seed=32)
        codes, scales = quantize_rows(corpus)
        queries = random_unit_rows(1, 64, seed=33)
        scores, idx = pallas_bin_topk_int8(
            jnp.asarray(queries), jnp.asarray(codes), jnp.asarray(scales),
            jnp.int32(512), k=5, bins=512, tile_rows=256, interpret=True,
        )
        assert scores.shape == (1, 5) and np.asarray(idx).max() < 512


@pytest.mark.tpu
class TestPipelinedKernelOnHardware:
    """pallas_bin_topk_pipelined is TPU-only (manual DMA has no interpreter
    model); on hardware it must be bit-identical to the grid kernel."""

    def test_bit_parity_with_grid_kernel(self):
        import jax

        if jax.default_backend() != "tpu":
            pytest.skip("needs a real TPU")
        import jax.numpy as jnp

        from lean_explore_tpu.ops import l2_normalize
        from lean_explore_tpu.ops.pallas_retrieval import (
            pallas_bin_topk,
            pallas_bin_topk_pipelined,
        )

        rng = np.random.default_rng(0)
        corpus = np.asarray(
            l2_normalize(rng.standard_normal((8192, 256)).astype(np.float32))
        ).astype(jnp.bfloat16)
        q = np.asarray(
            l2_normalize(rng.standard_normal((16, 256)).astype(np.float32))
        )
        n_valid = jnp.asarray(8000, jnp.int32)
        s_a, i_a = pallas_bin_topk(
            jnp.asarray(q), jnp.asarray(corpus), n_valid,
            k=64, bins=2048, exact_epilogue=True,
        )
        s_b, i_b = pallas_bin_topk_pipelined(
            jnp.asarray(q), jnp.asarray(corpus), n_valid,
            k=64, bins=2048, exact_epilogue=True,
        )
        np.testing.assert_array_equal(np.asarray(i_a), np.asarray(i_b))
        np.testing.assert_array_equal(np.asarray(s_a), np.asarray(s_b))
