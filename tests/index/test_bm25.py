"""BM25 index tests: hand-computed bm25+ scores, oracle parity, persistence."""

import math

import numpy as np
import pytest

from lean_explore_tpu.index.bm25 import Bm25Index, Bm25Params


def dense_bm25plus_oracle(
    corpus: list[list[str]], query: list[str], k1=1.5, b=0.75, delta=0.5
) -> np.ndarray:
    """Direct, unoptimized BM25+ (Lv & Zhai) over a tokenized corpus."""
    n = len(corpus)
    dl = np.array([len(doc) for doc in corpus], dtype=np.float64)
    avgdl = dl.mean()
    vocab = {t for doc in corpus for t in doc}
    scores = np.zeros(n)
    for t in query:
        if t not in vocab:
            continue
        df = sum(1 for doc in corpus if t in doc)
        idf = math.log((n + 1) / df)
        for d, doc in enumerate(corpus):
            tf = doc.count(t)
            tfc = (k1 + 1) * tf / (k1 * (1 - b + b * dl[d] / avgdl) + tf) + delta
            scores[d] += idf * tfc
    return scores


CORPUS = [
    ["nat", "add"],
    ["nat", "mul"],
    ["list", "map"],
    ["nat", "add", "comm"],
]


class TestScoring:
    def test_matches_direct_formula(self):
        index = Bm25Index.build(CORPUS)
        for query in (
            ["nat"],
            ["nat", "add"],
            ["add", "add"],  # duplicate query tokens double-count
            ["zzz"],  # OOV
            [],
            ["nat", "zzz", "map"],
        ):
            got = index.score(query)
            want = dense_bm25plus_oracle(CORPUS, query)
            np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_oov_and_empty_are_zero(self):
        index = Bm25Index.build(CORPUS)
        assert np.all(index.score([]) == 0.0)
        assert np.all(index.score(["unknown"]) == 0.0)

    def test_nonoccurring_docs_get_delta_constant(self):
        """Docs without the token still score idf*delta (the bm25+ tail)."""
        index = Bm25Index.build(CORPUS)
        scores = index.score(["map"])
        idf = math.log((4 + 1) / 1)
        np.testing.assert_allclose(scores[0], idf * 0.5, rtol=1e-12)
        assert scores[2] > scores[0]

    def test_tf_saturation(self):
        corpus = [["x"] * 5 + ["pad"], ["x", "pad", "pad", "pad", "pad", "pad"]]
        index = Bm25Index.build(corpus)
        scores = index.score(["x"])
        assert scores[0] > scores[1]  # higher tf wins
        want = dense_bm25plus_oracle(corpus, ["x"])
        np.testing.assert_allclose(scores, want, rtol=1e-12)

    def test_randomized_oracle_parity(self):
        rng = np.random.default_rng(42)
        tokens = [f"t{i}" for i in range(30)]
        for _ in range(20):
            corpus = [
                [tokens[rng.integers(0, 30)] for _ in range(rng.integers(1, 8))]
                for _ in range(rng.integers(2, 15))
            ]
            query = [
                "oov" if rng.random() < 0.15 else tokens[rng.integers(0, 30)]
                for _ in range(rng.integers(0, 6))
            ]
            index = Bm25Index.build(corpus)
            np.testing.assert_allclose(
                index.score(query),
                dense_bm25plus_oracle(corpus, query),
                rtol=1e-10,
                err_msg=f"corpus={corpus} query={query}",
            )

    def test_score_batch(self):
        index = Bm25Index.build(CORPUS)
        batch = index.score_batch([["nat"], ["map"]])
        np.testing.assert_allclose(batch[0], index.score(["nat"]))
        np.testing.assert_allclose(batch[1], index.score(["map"]))


class TestRetrieve:
    def test_topk_order(self):
        index = Bm25Index.build(CORPUS)
        idx, scores = index.retrieve(["nat", "add"], k=4)
        assert len(idx) == 4
        assert list(scores) == sorted(scores, reverse=True)
        # Doc 0 ("nat add") must beat doc 2 ("list map")
        assert list(idx).index(0) < list(idx).index(2)

    def test_k_clamped(self):
        index = Bm25Index.build(CORPUS)
        idx, scores = index.retrieve(["nat"], k=1000)
        assert len(idx) == 4

    def test_tie_break_by_doc_index(self):
        corpus = [["a"], ["a"], ["a"]]
        index = Bm25Index.build(corpus)
        idx, _ = index.retrieve(["a"], k=3)
        assert list(idx) == [0, 1, 2]

    def test_empty_corpus_query(self):
        index = Bm25Index.build([["a"]])
        idx, scores = index.retrieve([], k=5)
        assert len(idx) == 1 and scores[0] == 0.0


class TestOtherMethods:
    def test_lucene_idf(self):
        index = Bm25Index.build(CORPUS, Bm25Params(method="lucene"))
        scores = index.score(["map"])
        # lucene has no +delta tail: non-occurring docs score 0
        assert scores[0] == 0.0 and scores[2] > 0

    def test_unknown_method_raises(self):
        with pytest.raises(ValueError):
            Bm25Index.build(CORPUS, Bm25Params(method="tfidf"))


class TestPersistence:
    def test_round_trip(self, tmp_path):
        index = Bm25Index.build(CORPUS)
        path = tmp_path / "bm25.npz"
        index.save(path)
        loaded = Bm25Index.load(path)
        assert loaded.vocab == index.vocab
        assert loaded.params == index.params
        for q in (["nat", "add"], ["map"], []):
            np.testing.assert_allclose(loaded.score(q), index.score(q))

    def test_missing_file(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            Bm25Index.load(tmp_path / "none.npz")
