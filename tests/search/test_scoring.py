"""Fusion math tests: hand-computed expectations + parity vs the reference
implementation (loaded file-direct as a stdlib-only oracle)."""

import importlib.util
import math
import pathlib
import random

import pytest

from lean_explore_tpu.search import scoring

_REF_SCORING = pathlib.Path("/root/reference/src/lean_explore/search/scoring.py")


def _load_reference_module():
    spec = importlib.util.spec_from_file_location("ref_scoring", _REF_SCORING)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ref = _load_reference_module() if _REF_SCORING.exists() else None
needs_ref = pytest.mark.skipif(ref is None, reason="reference repo not mounted")


class TestNormalizeScores:
    def test_basic_range(self):
        assert scoring.normalize_scores([1.0, 2.0, 3.0]) == [0.0, 0.5, 1.0]

    def test_empty(self):
        assert scoring.normalize_scores([]) == []

    def test_degenerate_positive(self):
        assert scoring.normalize_scores([5.0, 5.0]) == [1.0, 1.0]

    def test_degenerate_zero(self):
        assert scoring.normalize_scores([0.0, 0.0]) == [0.0, 0.0]

    def test_degenerate_negative(self):
        assert scoring.normalize_scores([-2.0, -2.0]) == [0.0, 0.0]

    def test_negative_range(self):
        out = scoring.normalize_scores([-3.0, -1.0])
        assert out == [0.0, 1.0]


class TestNormalizeDependencyCounts:
    def test_log_scale(self):
        out = scoring.normalize_dependency_counts([0, 1, 3])
        assert out[0] == 0.0
        assert out[2] == 1.0
        assert out[1] == pytest.approx(math.log(2) / math.log(4))

    def test_all_zero(self):
        assert scoring.normalize_dependency_counts([0, 0]) == [0.0, 0.0]

    def test_empty(self):
        assert scoring.normalize_dependency_counts([]) == []


class TestComputeRanks:
    def test_descending(self):
        assert scoring.compute_ranks([3.0, 1.0, 2.0]) == [1, 3, 2]

    def test_zero_scores_get_worst_rank(self):
        assert scoring.compute_ranks([3.0, 0.0, 2.0]) == [1, 4, 2]

    def test_stable_ties(self):
        # Equal scores keep original order (stable sort).
        assert scoring.compute_ranks([2.0, 2.0, 1.0]) == [1, 2, 3]


class TestRRF:
    def test_hand_computed(self):
        ranks_a = [1, 2, 3]
        ranks_b = [3, 1, 2]
        out = scoring.reciprocal_rank_fusion([ranks_a, ranks_b])
        assert out == pytest.approx([1 / 1 + 1 / 3, 1 / 2 + 1 / 1, 1 / 3 + 1 / 2])

    def test_with_k(self):
        out = scoring.reciprocal_rank_fusion([[1], [2]], k=60)
        assert out == pytest.approx([1 / 61 + 1 / 62])


class TestWeightedFusion:
    def test_weights(self):
        out = scoring.weighted_score_fusion([[0.0, 1.0], [1.0, 0.0]], [0.7, 0.3])
        assert out == pytest.approx([0.3, 0.7])

    def test_empty(self):
        assert scoring.weighted_score_fusion([], [1.0]) == []
        assert scoring.weighted_score_fusion([[]], [1.0]) == []


class TestFuzzy:
    def test_identical(self):
        assert scoring.fuzzy_name_score("Nat.add", "Nat.add") == 1.0

    def test_separator_insensitive(self):
        assert scoring.fuzzy_name_score("nat add", "Nat.add") == 1.0
        assert scoring.fuzzy_name_score("nat_add", "Nat.add") == 1.0

    def test_disjoint(self):
        assert scoring.fuzzy_name_score("xyz", "Qqq") < 0.3

    def test_batch_matches_single(self):
        names = ["Nat.add", "List.map", "Nat.add_comm"]
        batch = scoring.fuzzy_name_scores("nat add", names)
        singles = [scoring.fuzzy_name_score("nat add", n) for n in names]
        assert batch == singles


@needs_ref
class TestReferenceParity:
    """Randomized bit-parity against the reference's implementation."""

    def test_normalize_scores(self):
        rng = random.Random(0)
        for trial in range(200):
            n = rng.randrange(0, 12)
            scores = [rng.uniform(-5, 5) for _ in range(n)]
            if trial % 5 == 0 and n:
                scores = [scores[0]] * n  # degenerate range
            assert scoring.normalize_scores(scores) == pytest.approx(
                ref.normalize_scores(scores), abs=0, rel=1e-15
            )

    def test_normalize_dependency_counts(self):
        rng = random.Random(1)
        for _ in range(200):
            counts = [rng.randrange(0, 50) for _ in range(rng.randrange(0, 12))]
            assert scoring.normalize_dependency_counts(counts) == pytest.approx(
                ref.normalize_dependency_counts(counts), abs=0, rel=1e-15
            )

    def test_compute_ranks(self):
        rng = random.Random(2)
        for _ in range(200):
            n = rng.randrange(0, 12)
            scores = [rng.choice([0.0, 1.5, 2.5, 2.5, -1.0]) for _ in range(n)]
            assert scoring.compute_ranks(scores) == ref.compute_ranks(scores)

    def test_rrf(self):
        rng = random.Random(3)
        for _ in range(100):
            n = rng.randrange(1, 10)
            lists = [
                [rng.randrange(1, 20) for _ in range(n)]
                for _ in range(rng.randrange(1, 4))
            ]
            k = rng.choice([0, 10, 60])
            assert scoring.reciprocal_rank_fusion(lists, k) == pytest.approx(
                ref.reciprocal_rank_fusion(lists, k), rel=1e-15
            )

    def test_weighted_fusion(self):
        rng = random.Random(4)
        for _ in range(100):
            n = rng.randrange(1, 10)
            m = rng.randrange(1, 4)
            lists = [[rng.uniform(0, 10) for _ in range(n)] for _ in range(m)]
            weights = [rng.uniform(0, 1) for _ in range(m)]
            assert scoring.weighted_score_fusion(lists, weights) == pytest.approx(
                ref.weighted_score_fusion(lists, weights), rel=1e-12
            )

    def test_fuzzy(self):
        cases = [
            ("continuous function", "Continuous.comp"),
            ("nat.add", "Nat.add"),
            ("Nat_add_comm", "Nat.add_comm"),
            ("", "Nat"),
            ("x" * 250, "x" * 250 + "y"),  # autojunk threshold territory
        ]
        for q, n in cases:
            assert scoring.fuzzy_name_score(q, n) == ref.fuzzy_name_score(q, n)
