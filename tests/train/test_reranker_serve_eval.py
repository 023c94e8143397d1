"""End-to-end CI gate for the FULL pipeline: trained rerank must help.

Miniature of scripts/train_reranker_e2e.py (one subprocess, CPU). This is
the quality gate round-3 VERDICT asked for: the cross-encoder device path
(prefix_kv + rerank_scores_grouped) and the final fusion run inside a
labeled evaluation, so a rerank-path quality regression FAILS here instead
of only failing numeric parity unit tests. Uses the committed embedder
checkpoint (runs/embedder) for the dense stage; CPU XLA is deterministic,
so the asserted margins sit well under the observed fixed-seed values
(direct rerank 0.188, full-pipeline recall@1 0.594 vs hybrid 0.156).
"""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent


class TestRerankerServeEval:
    def test_full_pipeline_beats_no_rerank(self, tmp_path):
        proc = subprocess.run(
            [
                sys.executable,
                str(REPO / "scripts" / "train_reranker_e2e.py"),
                "--out", str(tmp_path / "run"),
                "--embedder", str(REPO / "runs" / "embedder" / "checkpoint"),
                "--n-decls", "200",
                "--n-concepts", "48",
                "--n-eval", "32",
                "--steps", "400",
                "--batch-size", "32",
                "--hidden-size", "64",
                "--num-layers", "2",
                "--rerank-top", "20",
                "--no-name-variants",
                "--platform", "cpu",
            ],
            capture_output=True,
            text=True,
            timeout=900,
            cwd=REPO,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        results = json.loads(proc.stdout.strip().splitlines()[-1])

        direct = results["reranker_direct"]
        # The cross-encoder readout itself learned (random ~= 1/50).
        # Margins track the observed fixed-seed values (direct 0.188,
        # full@1 0.594) with slack for XLA version drift, per round-4
        # VERDICT: a partial regression must fail, not just a total one.
        assert direct["random_init"]["recall_at_1_of_50"] <= 0.12
        assert direct["trained"]["recall_at_1_of_50"] >= 0.15

        pipe = results["pipeline"]
        full = pipe["full_pipeline_trained"]
        hybrid = pipe["hybrid_no_rerank"]
        dense = pipe["dense_only"]
        # The gate: trained rerank must lift the hybrid pipeline (both
        # relatively and in absolute terms), and the full pipeline must
        # not fall below its dense-only ablation at k=10.
        assert full["recall_at_1"] >= 0.45
        assert full["recall_at_1"] >= hybrid["recall_at_1"] + 0.2
        assert full["mrr_at_10"] >= hybrid["mrr_at_10"] + 0.1
        assert full["recall_at_10"] >= dense["recall_at_10"] - 0.05
        assert full["recall_at_10"] >= 0.95

        # Servable checkpoint: complete HF directory with scored tokens.
        ckpt = tmp_path / "run" / "checkpoint"
        for name in ("model.safetensors", "config.json", "tokenizer.json"):
            assert (ckpt / name).exists()

        # Cascade arm (round-4 VERDICT ask 6): the SAME miniature served
        # with LEAN_EXPLORE_RERANK_CASCADE at a coverage-complete cap must
        # be no worse than the plain rerank path up to ONE query — a
        # cascade composition bug (prescreen ordering, keep-set merge,
        # ordinal fusion) collapses these metrics and fails here instead
        # of shipping silently. Exactly-no-worse is NOT a theorem even at
        # a full-coverage cap: keep=16-of-20 excludes candidates whose
        # full-score rank is 17-20, and on a weak miniature (direct ~0.53)
        # the gold lands there for ~1/32 queries (measured: the deltas are
        # IDENTICAL at caps 32/48/64 >= doc length, so they are keep-set
        # semantics, not prescreen loss).
        cascade_out = tmp_path / "cascade.json"
        proc2 = subprocess.run(
            [
                sys.executable,
                str(REPO / "scripts" / "eval_cascade.py"),
                "--out", str(cascade_out),
                "--embedder", str(REPO / "runs" / "embedder" / "checkpoint"),
                "--reranker", str(ckpt),
                "--n-decls", "200",
                "--n-concepts", "48",
                "--n-eval", "32",
                "--rerank-top", "20",
                # Docs on this corpus are ~22 words; a 48-token prescreen
                # covers them whole (coverage-complete), keep=16 of 20.
                "--points", "48,16",
                "--platform", "cpu",
            ],
            capture_output=True,
            text=True,
            timeout=900,
            cwd=REPO,
        )
        assert proc2.returncode == 0, proc2.stderr[-2000:]
        cascade = json.loads(cascade_out.read_text())["results"]
        base = cascade["full_pipeline"]
        casc = cascade["cascade_48_16"]
        # +1e-3 absorbs the report's 4-decimal rounding of 1/32.
        one_query = 1.0 / casc["n_queries"] + 1e-3
        assert casc["recall_at_1"] >= base["recall_at_1"] - one_query
        assert casc["recall_at_10"] >= base["recall_at_10"] - one_query
        assert casc["mrr_at_10"] >= base["mrr_at_10"] - 0.05
        assert casc["recall_at_10"] >= 0.95
