"""Probe a trained reranker's gold-pair scores across document caps.

Scores held-out gold (query, document) pairs at several doc-token caps
(serving-semantics truncation via RerankerClient._truncate_docs) plus a
full-length random-distractor control, for one or more checkpoints.
This is the diagnostic that root-caused the truncation-augmentation
negative (docs/performance.md, "Truncation-augmented training"): the
augmented model scores gold near-distractor at EVERY length — a loss of
query-paraphrase generalization, not a prefix-length shortcut.

Usage:
    python scripts/probe_reranker_doclen.py \
        --checkpoints runs/scale200k/reranker_trunc/checkpoint \
                      runs/scale200k/reranker/checkpoint \
        --n-decls 200000 --n-concepts 6000 --body-sentences 5
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoints", type=Path, nargs="+", required=True)
    # Corpus args MUST match the training run so held-out queries match.
    parser.add_argument("--n-decls", type=int, default=200_000)
    parser.add_argument("--n-concepts", type=int, default=6000)
    parser.add_argument("--n-eval", type=int, default=512)
    parser.add_argument("--body-sentences", type=int, default=5)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--queries", type=int, default=64)
    parser.add_argument(
        "--caps", type=int, nargs="+", default=(96, 64, 48, 24)
    )
    parser.add_argument("--max-length", type=int, default=192)
    parser.add_argument("--report", type=Path, default=None)
    args = parser.parse_args()

    from lean_explore_tpu.train.synthetic import make_corpus, reranker_document
    from lean_explore_tpu.util.reranker_client import RerankerClient

    corpus = make_corpus(
        n_decls=args.n_decls,
        n_concepts=args.n_concepts,
        n_eval=args.n_eval,
        seed=args.seed,
        body_sentences=args.body_sentences,
    )
    name_to_idx = {d.name: i for i, d in enumerate(corpus.declarations)}
    rng = np.random.default_rng(args.seed + 2)
    queries, golds = [], []
    for q, target in corpus.eval_queries[: args.queries]:
        queries.append(q)
        golds.append(reranker_document(corpus.declarations[name_to_idx[target]]))
    hold = (corpus.n_train, len(corpus.declarations))
    distractors = [
        reranker_document(corpus.declarations[int(rng.integers(*hold))])
        for _ in queries
    ]

    report: dict = {"task": vars(args) | {"checkpoints": [str(c) for c in args.checkpoints], "report": None, "caps": list(args.caps)}, "results": {}}
    for ckpt in args.checkpoints:
        client = RerankerClient(
            str(ckpt), model_dir=ckpt, max_length=args.max_length,
            dtype="float32",
        )
        arms = [("full", golds)]
        arms += [
            (f"cap{c}", client._truncate_docs(golds, c)) for c in args.caps
        ]
        arms.append(("distractor_full", distractors))
        rows = {}
        for label, docs in arms:
            scores = np.concatenate(
                client.rerank_grouped_sync(queries, [[d] for d in docs])
            )
            rows[label] = {
                "mean": round(float(scores.mean()), 4),
                "median": round(float(np.median(scores)), 4),
                "frac_true": round(float((scores > 0.5).mean()), 4),
            }
            print(f"{ckpt} {label:16s} {rows[label]}")
        report["results"][str(ckpt)] = rows

    if args.report:
        args.report.write_text(json.dumps(report, indent=1))
        print(f"wrote {args.report}")


if __name__ == "__main__":
    main()
