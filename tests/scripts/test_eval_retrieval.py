"""Smoke test for the retrieval-quality eval harness."""

import json
import subprocess
import sys


def test_synthetic_eval_runs_and_reports():
    proc = subprocess.run(
        [
            sys.executable, "scripts/eval_retrieval.py",
            "--n", "600", "--dim", "32", "--queries", "24",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": "/root"},
    )
    assert proc.returncode == 0, proc.stderr[-800:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert set(report) == {"hybrid", "dense_only", "bm25_only"}
    for cfg in report.values():
        assert 0.0 <= cfg["recall_at_10"] <= 1.0
        assert cfg["n_queries"] == 24
    # The fused signals must not be worse than the best single signal by a
    # large margin on this separable corpus.
    assert report["hybrid"]["recall_at_10"] >= max(
        report["dense_only"]["recall_at_10"] - 0.1,
        report["bm25_only"]["recall_at_10"] - 0.1,
    )
