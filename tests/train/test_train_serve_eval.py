"""End-to-end: train the embedder, export, serve, eval — trained beats random.

Miniature of scripts/train_embedder_e2e.py (one subprocess, CPU): the full
text -> tokenizer -> model -> embedding -> index -> engine loop with
non-random weights, the behavior VERDICT round 2 asked to demonstrate.
"""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent


class TestTrainServeEval:
    def test_trained_beats_random(self, tmp_path):
        proc = subprocess.run(
            [
                sys.executable,
                str(REPO / "scripts" / "train_embedder_e2e.py"),
                "--out", str(tmp_path / "run"),
                "--n-decls", "200",
                "--n-concepts", "48",
                "--n-eval", "32",
                "--steps", "300",
                "--batch-size", "32",
                "--hidden-size", "64",
                "--platform", "cpu",
            ],
            capture_output=True,
            text=True,
            timeout=600,
            cwd=REPO,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        results = json.loads(proc.stdout.strip().splitlines()[-1])

        trained = results["trained"]["dense_only"]
        random_init = results["random_init"]["dense_only"]
        # The task is unsolvable lexically (bm25-only is ~0 by construction)
        # and solvable only by learned synonym->base alignment.
        assert results["trained"]["bm25_only"]["recall_at_10"] <= 0.05
        # At this miniature scale (200 docs) a random-init transformer
        # already scores via token overlap with the synonym-bearing titles;
        # training must add a clear margin on top (observed at these args:
        # 0.53 vs 0.41 recall@10, 0.29 vs 0.22 MRR@10).
        assert trained["recall_at_10"] >= random_init["recall_at_10"] + 0.1
        assert trained["recall_at_10"] >= 0.5
        assert trained["mrr_at_10"] >= random_init["mrr_at_10"] + 0.05
        # The hybrid engine path serves the trained embeddings end-to-end.
        assert results["trained"]["hybrid"]["recall_at_10"] >= 0.2

        # The exported checkpoint is a complete servable model directory.
        ckpt = tmp_path / "run" / "checkpoint"
        for name in ("model.safetensors", "config.json", "tokenizer.json"):
            assert (ckpt / name).exists()
        report = json.loads((tmp_path / "run" / "eval.json").read_text())
        assert report["train_history"][-1]["accuracy"] > 0.5
