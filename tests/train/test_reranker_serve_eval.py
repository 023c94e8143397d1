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
        assert direct["random_init"]["recall_at_1_of_50"] <= 0.12
        assert direct["trained"]["recall_at_1_of_50"] >= 0.12

        pipe = results["pipeline"]
        full = pipe["full_pipeline_trained"]
        hybrid = pipe["hybrid_no_rerank"]
        dense = pipe["dense_only"]
        # The gate: trained rerank must lift the hybrid pipeline, and the
        # full pipeline must not fall below its dense-only ablation at k=10.
        assert full["recall_at_1"] >= hybrid["recall_at_1"] + 0.2
        assert full["mrr_at_10"] >= hybrid["mrr_at_10"] + 0.1
        assert full["recall_at_10"] >= dense["recall_at_10"] - 0.05
        assert full["recall_at_10"] >= 0.95

        # Servable checkpoint: complete HF directory with scored tokens.
        ckpt = tmp_path / "run" / "checkpoint"
        for name in ("model.safetensors", "config.json", "tokenizer.json"):
            assert (ckpt / name).exists()
