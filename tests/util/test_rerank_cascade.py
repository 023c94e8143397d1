"""Two-stage rerank cascade: structural guarantees of the opt-in path."""

import asyncio

import numpy as np
import pytest

from lean_explore_tpu.util.reranker_client import RerankerClient

from tests.helpers import make_tiny_model_dir


@pytest.fixture(scope="module")
def client(tmp_path_factory):
    ckpt = make_tiny_model_dir(tmp_path_factory.mktemp("rrc") / "m")
    return RerankerClient(str(ckpt), model_dir=ckpt, dtype="float32")


QUERIES = ["nat add comm", "list map"]
DOCS = [
    [
        "the sum of two natural numbers a b the sum of two natural numbers",
        "continuous function map of a list of numbers and more numbers",
        "prime numbers of a b and the function of two",
        "addition of natural numbers the sum of two function",
    ],
    [
        "function map of a list the map of function list",
        "the sum of two numbers and the sum again",
        "nat add of two prime numbers of a",
        "continuous prime function of the list map",
    ],
]


class TestCascade:
    def test_no_truncation_equals_plain_grouped(self, client):
        """stage1 cap beyond every doc length + keep >= n_docs == the plain
        grouped scores bit for bit (stage 2 rescores everything)."""
        want = client.rerank_grouped_sync(QUERIES, DOCS)
        got = client.rerank_grouped_cascade_sync(
            QUERIES, DOCS, stage1_doc_tokens=512, keep=10
        )
        for w, g in zip(want, got):
            np.testing.assert_allclose(g, w, atol=1e-6)

    def test_kept_docs_get_full_length_scores(self, client):
        full = client.rerank_grouped_sync(QUERIES, DOCS)
        got = client.rerank_grouped_cascade_sync(
            QUERIES, DOCS, stage1_doc_tokens=4, keep=2
        )
        stage1 = client.rerank_grouped_sync(
            QUERIES, DOCS, suffix_cap=4
        )
        for gi in range(len(QUERIES)):
            top = sorted(
                range(len(DOCS[gi])),
                key=lambda i: stage1[gi][i],
                reverse=True,
            )[:2]
            for pos in top:
                assert got[gi][pos] == pytest.approx(
                    full[gi][pos], abs=1e-6
                )

    def test_pruned_docs_rank_below_rescored_in_stage1_order(self, client):
        """Ordinal composition: every pruned candidate scores strictly
        below every rescored one, and pruned candidates keep their
        stage-1 relative order (raw score mixing is not sound — the two
        P(true) families are differently calibrated)."""
        got = client.rerank_grouped_cascade_sync(
            QUERIES, DOCS, stage1_doc_tokens=4, keep=2
        )
        stage1 = client.rerank_grouped_sync(QUERIES, DOCS, suffix_cap=4)
        for gi in range(len(QUERIES)):
            order = sorted(
                range(len(DOCS[gi])),
                key=lambda i: stage1[gi][i],
                reverse=True,
            )
            top, pruned = order[:2], order[2:]
            floor = min(got[gi][pos] for pos in top)
            for pos in pruned:
                assert got[gi][pos] < floor
            # stage-1 order preserved within the pruned tail
            pruned_scores = [got[gi][pos] for pos in pruned]
            assert pruned_scores == sorted(pruned_scores, reverse=True)

    def test_suffix_cap_changes_scores(self, client):
        """Truncation must actually shorten what the model sees."""
        full = client.rerank_grouped_sync(QUERIES, DOCS)
        capped = client.rerank_grouped_sync(QUERIES, DOCS, suffix_cap=3)
        diffs = [
            abs(f - c)
            for fr, cr in zip(full, capped)
            for f, c in zip(fr, cr)
        ]
        assert max(diffs) > 1e-4

    def test_prescreen_truncates_on_prefix_disabled_fallback(
        self, client, monkeypatch
    ):
        """With the prefix path disabled, suffix_cap must still truncate
        the prescreen (it previously ran at FULL length silently — costing
        more than no cascade while claiming a prescreen happened)."""
        monkeypatch.setenv("LEAN_EXPLORE_RERANK_PREFIX", "0")
        full = client.rerank_grouped_sync(QUERIES, DOCS)
        capped = client.rerank_grouped_sync(QUERIES, DOCS, suffix_cap=3)
        diffs = [
            abs(f - c)
            for fr, cr in zip(full, capped)
            for f, c in zip(fr, cr)
        ]
        assert max(diffs) > 1e-4

    def test_stage1_skipped_when_nothing_to_prune(self, client, monkeypatch):
        """Groups with len(docs) <= keep must not pay a truncated stage-1
        forward (their prescreen scores would be discarded entirely)."""
        calls = []
        orig = client.rerank_grouped_sync

        def spy(queries, docs_grouped, **kw):
            calls.append((len(queries), kw.get("suffix_cap")))
            return orig(queries, docs_grouped, **kw)

        monkeypatch.setattr(client, "rerank_grouped_sync", spy)
        client.rerank_grouped_cascade_sync(
            QUERIES, DOCS, stage1_doc_tokens=4, keep=10
        )
        # keep >= every group size -> no stage-1 call at all, one rescore.
        assert calls == [(len(QUERIES), None)]
        calls.clear()
        client.rerank_grouped_cascade_sync(
            QUERIES, DOCS, stage1_doc_tokens=4, keep=2
        )
        assert calls == [(len(QUERIES), 4), (len(QUERIES), None)]

    def test_explicit_dtype_wins_over_int8_env(
        self, tmp_path_factory, monkeypatch
    ):
        monkeypatch.setenv("LEAN_EXPLORE_RERANKER_INT8", "1")
        ckpt = make_tiny_model_dir(tmp_path_factory.mktemp("rrc_int8") / "m")
        explicit = RerankerClient(str(ckpt), model_dir=ckpt, dtype="float32")
        assert not explicit.int8
        defaulted = RerankerClient(str(ckpt), model_dir=ckpt)
        assert defaulted.int8

    def test_env_opt_in_routes_cascade(self, client, monkeypatch):
        monkeypatch.setenv("LEAN_EXPLORE_RERANK_CASCADE", "512,10")
        got = asyncio.run(client.rerank_grouped(QUERIES, DOCS))
        want = client.rerank_grouped_sync(QUERIES, DOCS)
        for w, g in zip(want, got):
            np.testing.assert_allclose(g, w, atol=1e-6)

    def test_env_malformed_raises(self, client, monkeypatch):
        monkeypatch.setenv("LEAN_EXPLORE_RERANK_CASCADE", "banana")
        with pytest.raises(ValueError, match="RERANK_CASCADE"):
            asyncio.run(client.rerank_grouped(QUERIES, DOCS))

    def test_invalid_params_raise(self, client):
        with pytest.raises(ValueError):
            client.rerank_grouped_cascade_sync(
                QUERIES, DOCS, stage1_doc_tokens=0, keep=2
            )
