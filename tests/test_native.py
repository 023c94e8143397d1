"""lexcore native-library parity tests (skipped when the .so isn't built)."""

import random
import string

import numpy as np
import pytest

from lean_explore_tpu import native
from lean_explore_tpu.index.bm25 import Bm25Index
from lean_explore_tpu.search.tokenization import tokenize_spaced

lexcore = native.load_lexcore()
needs_lexcore = pytest.mark.skipif(
    lexcore is None, reason="liblexcore.so not built (make -C native)"
)


@needs_lexcore
class TestBm25Native:
    def test_score_parity_with_numpy(self, monkeypatch):
        rng = np.random.default_rng(1)
        words = [f"t{i}" for i in range(50)]
        corpus = [
            [words[rng.integers(0, 50)] for _ in range(rng.integers(1, 7))]
            for _ in range(300)
        ]
        index = Bm25Index.build(corpus)
        for query in ([words[0]], [words[1], words[2], "oov"], [], ["oov"]):
            native_scores = index.score(query)
            monkeypatch.setattr(native, "_lib", None)
            monkeypatch.setattr(native, "_load_attempted", True)
            numpy_scores = index.score(query)
            monkeypatch.setattr(native, "_lib", lexcore)
            np.testing.assert_allclose(native_scores, numpy_scores, rtol=1e-12)

    def test_retrieve_parity_including_ties(self, monkeypatch):
        corpus = [["a"], ["a"], ["b"], ["a", "b"]] * 25
        index = Bm25Index.build(corpus)
        i_native, v_native = index.retrieve(["a"], 30)
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_load_attempted", True)
        i_numpy, v_numpy = index.retrieve(["a"], 30)
        assert list(i_native) == list(i_numpy)
        np.testing.assert_allclose(v_native, v_numpy)

    def test_lucene_and_robertson_methods(self, monkeypatch):
        from lean_explore_tpu.index.bm25 import Bm25Params

        corpus = [["x", "y"], ["x"], ["z"]]
        for method in ("lucene", "robertson"):
            index = Bm25Index.build(corpus, Bm25Params(method=method))
            got = index.score(["x", "z"])
            monkeypatch.setattr(native, "_lib", None)
            monkeypatch.setattr(native, "_load_attempted", True)
            want = index.score(["x", "z"])
            monkeypatch.setattr(native, "_lib", lexcore)
            np.testing.assert_allclose(got, want, rtol=1e-12)


@needs_lexcore
class TestTopkNative:
    def test_basic(self):
        scores = np.array([1.0, 5.0, 3.0, 5.0, 0.0])
        idx, vals = native.topk_native(scores, 3)
        assert list(idx) == [1, 3, 2]  # tie between 1 and 3 -> lower index first
        assert list(vals) == [5.0, 5.0, 3.0]

    def test_k_clamped(self):
        idx, vals = native.topk_native(np.array([2.0, 1.0]), 10)
        assert list(idx) == [0, 1]


@needs_lexcore
class TestTokenizerNative:
    def test_parity_with_python(self):
        cases = [
            "Nat.add_comm",
            "CategoryTheory.isoOfFullyFaithful",
            "HTTPServer",
            "fin2Add",
            "",
            "...",
            "a-b c'd",
        ]
        rng = random.Random(3)
        alphabet = string.ascii_letters + string.digits + "._ -"
        cases += [
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
            for _ in range(300)
        ]
        for text in cases:
            got = native.tokenize_spaced_native(text)
            assert got is not None
            assert got == tokenize_spaced(text), repr(text)

    def test_non_ascii_falls_back(self):
        assert native.tokenize_spaced_native("Näme.add") is None


class TestFallbackWithoutLibrary:
    def test_disabled_env(self, monkeypatch):
        monkeypatch.setenv("LEAN_EXPLORE_NO_NATIVE", "1")
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_load_attempted", False)
        assert native.load_lexcore() is None
        assert native.topk_native(np.array([1.0]), 1) is None
        # BM25 still works on the numpy path
        index = Bm25Index.build([["a"], ["b"]])
        idx, _ = index.retrieve(["a"], 2)
        assert list(idx)[0] == 0


class TestNativeFusion:
    """le_rrf_fuse / le_dep_boost vs the engine's Python implementations:
    identical ids, order, and float64 scores (same arithmetic by design)."""

    def test_rrf_randomized_parity(self):
        import numpy as np

        from lean_explore_tpu.native import rrf_fuse_native
        from lean_explore_tpu.search.engine import SearchEngine

        if rrf_fuse_native(
            np.array([1]), np.array([1.0]), np.array([2]), np.array([0.5])
        ) is None:
            pytest.skip("lexcore >= 0.2 not built")
        rng = __import__("random").Random(0)
        for trial in range(200):
            nb, ns = rng.randint(0, 40), rng.randint(0, 40)
            pool = list(range(1, 60))
            rng.shuffle(pool)
            bm25 = {pool[i]: rng.choice([0.0, 1.5, 3.25, 7.0]) for i in range(nb)}
            rng.shuffle(pool)
            sem = {pool[i]: rng.choice([0.1, 0.5, 0.9]) for i in range(ns)}
            want = SearchEngine._compute_rrf_scores(bm25, sem)
            got = SearchEngine._rrf_scores_any(bm25, sem)
            assert [i for i, _ in got] == [i for i, _ in want], trial
            assert [s for _, s in got] == [s for _, s in want], trial

    def test_dep_boost_randomized_parity(self):
        import json
        import random

        import numpy as np

        from lean_explore_tpu.models import Declaration
        from lean_explore_tpu.native import dep_boost_native
        from lean_explore_tpu.search.engine import SearchEngine

        if dep_boost_native(
            np.array([1]), np.array([0, 0, 0]), np.array([], dtype=np.int64)
        ) is None:
            pytest.skip("lexcore >= 0.2 not built")
        rng = random.Random(1)
        n_decls = 50
        names = [f"D.n{i}" for i in range(1, n_decls + 1)]
        deps_by_id = {
            i: rng.sample(names, rng.randint(0, 4)) for i in range(1, n_decls + 1)
        }
        declarations = {
            i: Declaration(
                id=i, name=names[i - 1], module="D.M", source_text="s",
                source_link="l", dependencies=json.dumps(deps_by_id[i]),
            )
            for i in range(1, n_decls + 1)
        }
        name_to_id = {names[i - 1]: i for i in range(1, n_decls + 1)}
        indptr = np.zeros(n_decls + 2, dtype=np.int64)
        targets = []
        for i in range(1, n_decls + 1):
            targets.extend(name_to_id[d] for d in deps_by_id[i])
            indptr[i + 1] = len(targets)
        targets = np.asarray(targets, dtype=np.int64)

        for trial in range(100):
            ids = rng.sample(range(1, n_decls + 1), rng.randint(1, n_decls))
            rrf = [(cid, 1.0 / (r + 1)) for r, cid in enumerate(ids)]
            dep_names = {i: deps_by_id[i] for i in ids}
            want = SearchEngine._dependency_boost(
                rrf, declarations, dep_names, top_n=500
            )
            got_ids, got_scores = dep_boost_native(
                np.asarray(ids, dtype=np.int64), indptr, targets
            )
            assert got_ids.tolist() == [i for i, _ in want], trial
            assert got_scores.tolist() == [s for _, s in want], trial


class TestFuzzyNative:
    def test_ratio_parity_with_difflib(self):
        import difflib
        import random

        from lean_explore_tpu.native import fuzzy_batch_native

        rng = random.Random(7)
        alphabet = "nat add mul lst map real sqrt topology πλ'"
        pairs = []
        for _ in range(300):
            a = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
            b = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
            pairs.append((a, b))
        # Autojunk regime: second sequence >= 200 chars with popular chars.
        for _ in range(20):
            a = "".join(rng.choice("abcde .") for _ in range(rng.randint(5, 60)))
            b = "".join(rng.choice("abcde .") for _ in range(rng.randint(200, 400)))
            pairs.append((a, b))
        # Autojunk with MIXED popularity: one char above the 1% threshold
        # (popular -> anchor-pruned) among many below-threshold chars. The
        # popular char must still participate in match EXTENSION (CPython's
        # bpopular never gates the extension loops when isjunk=None); a
        # popularity-gated extension stops early at these boundaries and
        # diverges from difflib (advisor round-3 finding).
        rare = "bcdfgklmnprstvzBCDFGKLMNPRSTVZ0123456789"
        for _ in range(40):
            n = rng.randint(200, 420)
            b_chars = [rng.choice(rare) for _ in range(n)]
            # "a" appears ~10% of the time: clearly popular.
            for pos in rng.sample(range(n), n // 10):
                b_chars[pos] = "a"
            b = "".join(b_chars)
            # a = a slice of b (guaranteeing long matches that cross
            # popular/non-popular boundaries) with light mutation.
            start = rng.randint(0, n // 2)
            a_chars = list(b[start : start + rng.randint(20, n - start)])
            for _ in range(rng.randint(0, 3)):
                if a_chars:
                    a_chars[rng.randrange(len(a_chars))] = rng.choice(rare)
            pairs.append(("".join(a_chars), b))
        pairs.append(("", ""))
        pairs.append(("x", ""))
        pairs.append(("", "y"))
        got = fuzzy_batch_native([a for a, _ in pairs], [b for _, b in pairs])
        if got is None:
            import pytest

            pytest.skip("lexcore unavailable")
        for (a, b), score in zip(pairs, got.tolist()):
            want = difflib.SequenceMatcher(None, a, b).ratio()
            assert score == want, (a, b, score, want)

    def test_scoring_layer_uses_native_consistently(self):
        from lean_explore_tpu.search import scoring

        names = ["Nat.add", "Nat.add_comm", "List.map", "Real.sqrt'", "ℝ.measure"]
        batch = scoring.fuzzy_name_scores("nat add", names)
        singles = [scoring.fuzzy_name_score("nat add", n) for n in names]
        assert batch == singles
