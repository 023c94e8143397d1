"""Cascade prescreen coverage: gold's stage-1 rank vs the token budget.

The rerank cascade (util/reranker_client.py: rerank_grouped_cascade_sync)
prescreens every candidate with documents truncated to
``stage1_doc_tokens`` suffix tokens and full-length-rescores only the
top-``keep``. Its quality is governed by one number: the probability
that the gold document survives the prescreen — P(stage-1 rank of gold
<= keep). This script measures that coverage over the REAL engine's
candidate groups (the same rerank_top-candidate sets production fusion
sees), per token budget, so an operating point can be chosen from data
instead of guessed: pick the smallest cap whose top-``keep`` coverage
is ~1.0 at YOUR deployment's document lengths.

Measured on the synthetic training corpus (22-word informalizations)
the table is a cliff, not a slope: caps <= 16 tokens rank gold WORSE
than random (median rank 26-31 of 50 — truncation denatures the
document and the scores are noise), cap 24 covers ~91% at keep=16, cap
32 covers 100% (docs fit entirely). Longer documents shift the cliff
right; re-run this against a representative corpus before enabling
LEAN_EXPLORE_RERANK_CASCADE in a new deployment.

    python scripts/measure_prescreen_coverage.py --out runs/prescreen_coverage.json
"""

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--out", type=Path, default=Path("runs/prescreen_coverage.json")
    )
    parser.add_argument(
        "--embedder", type=Path, default=Path("runs/embedder/checkpoint")
    )
    parser.add_argument(
        "--reranker", type=Path, default=Path("runs/reranker/checkpoint")
    )
    parser.add_argument("--n-decls", type=int, default=5000)
    parser.add_argument("--n-concepts", type=int, default=600)
    parser.add_argument("--n-eval", type=int, default=192)
    parser.add_argument("--rerank-top", type=int, default=50)
    parser.add_argument(
        "--body-sentences", type=int, default=1,
        help="body sentences per doc (5 ~= production length, ~110-word docs)",
    )
    parser.add_argument("--emb-max-length", "--serve-max-length", type=int, default=64)
    parser.add_argument("--rr-max-length", "--client-max-length", type=int, default=128)
    parser.add_argument(
        "--caps", type=int, nargs="+", default=[8, 12, 16, 24, 32, 48, 64]
    )
    parser.add_argument(
        "--data-dir", type=str, default=None,
        help="measure against an EXISTING artifact directory instead of "
        "rebuilding and re-embedding the corpus; corpus args still "
        "generate the labeled eval queries and must match the index.",
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", choices=("cpu", "tpu"), default="cpu")
    args = parser.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from lean_explore_tpu.evaluation import evaluate_engine
    from lean_explore_tpu.index import build_index_artifacts, load_index_artifacts
    from lean_explore_tpu.models import DeclarationStore
    from lean_explore_tpu.search.engine import SearchEngine
    from lean_explore_tpu.train.synthetic import make_corpus
    from lean_explore_tpu.util.embedding_client import EmbeddingClient
    from lean_explore_tpu.util.reranker_client import RerankerClient

    corpus = make_corpus(
        n_decls=args.n_decls,
        n_concepts=args.n_concepts,
        n_eval=args.n_eval,
        seed=args.seed,
        body_sentences=args.body_sentences,
    )
    target_by_query = dict(corpus.eval_queries)

    emb_client = EmbeddingClient(
        str(args.embedder), max_length=args.emb_max_length, batch_size=256,
        dtype="float32",
    )

    if args.data_dir is not None:
        # Measure against an EXISTING artifact directory (a served index
        # or a train_*_e2e.py run's artifacts/) — skips the corpus embed.
        work = Path(args.data_dir)
        store = DeclarationStore(work / "declarations.db")

        from lean_explore_tpu.evaluation import guard_store_vocab

        # A caller-owned index can mismatch the checkpoints just as
        # silently as a rebuilt one — guard both paths.
        guard_store_vocab(store, emb_client.tokenizer)
    else:
        work = args.out.parent / "prescreen_work"
        if work.exists():
            shutil.rmtree(work)
        work.mkdir(parents=True)
        store = DeclarationStore(work / "declarations.db", create=True)
        store.insert_many(corpus.declarations)

        log("embedding corpus ...")
        ids, texts = [], []
        for decl in store.iter_all(with_embeddings=False):
            ids.append(decl.id)
            texts.append(decl.informalization)

        from lean_explore_tpu.evaluation import guard_store_vocab

        guard_store_vocab(store, emb_client.tokenizer)
        vecs = emb_client.embed_sync(texts, is_query=False)
        store.set_embeddings(list(zip(ids, (v.tolist() for v in vecs))))
        build_index_artifacts(store, work)

    client = RerankerClient(
        str(args.reranker),
        model_dir=args.reranker,
        max_length=args.rr_max_length,
        dtype="float32",
    )

    # Capture the engine's real candidate groups: wrap the grouped scorer
    # and record each (query, candidate docs) it is asked to score at
    # full length during a normal evaluation pass.
    groups: list[tuple[str, list[str]]] = []
    orig = client.rerank_grouped_sync

    def recording(queries, docs_grouped, **kw):
        if not kw.get("suffix_cap"):
            for q, d in zip(queries, docs_grouped):
                groups.append((q, d))
        return orig(queries, docs_grouped, **kw)

    client.rerank_grouped_sync = recording
    engine = SearchEngine(
        str(work),
        store=store,
        artifacts=load_index_artifacts(str(work), mesh=False),
        embedding_client=emb_client,
        reranker_client=client,
    )
    evaluate_engine(engine, corpus.eval_queries, rerank_top=args.rerank_top)
    client.rerank_grouped_sync = orig
    log(f"captured {len(groups)} candidate groups")

    doc_words = [len(d.split()) for _, ds in groups for d in ds]
    report = {
        "task": {
            "n_decls": args.n_decls,
            "n_eval": args.n_eval,
            "rerank_top": args.rerank_top,
            "body_sentences": args.body_sentences,
        },
        "doc_words": {
            "median": float(np.median(doc_words)),
            "p90": float(np.percentile(doc_words, 90)),
        },
        "caps": {},
    }

    for cap in args.caps:
        t0 = time.perf_counter()
        ranks = []
        B = 64
        for start in range(0, len(groups), B):
            chunk = groups[start : start + B]
            scores = orig(
                [q for q, _ in chunk],
                [d for _, d in chunk],
                suffix_cap=cap,
            )
            for (q, docs), s in zip(chunk, scores):
                target = target_by_query.get(q)
                if target is None:
                    continue
                gold = next(
                    (
                        i
                        for i, d in enumerate(docs)
                        if d.startswith(target + ":")
                    ),
                    None,
                )
                if gold is None:
                    continue  # gold not retrieved: cascade can't affect it
                order = sorted(
                    range(len(docs)), key=lambda i: s[i], reverse=True
                )
                ranks.append(order.index(gold) + 1)
        r = np.array(ranks)
        row = {
            "top8": round(float((r <= 8).mean()), 4),
            "top12": round(float((r <= 12).mean()), 4),
            "top16": round(float((r <= 16).mean()), 4),
            "top25": round(float((r <= 25).mean()), 4),
            "median_rank": float(np.median(r)),
            "n": int(r.size),
            "seconds": round(time.perf_counter() - t0, 1),
        }
        report["caps"][cap] = row
        log(f"cap={cap}: {json.dumps(row)}")

    args.out.write_text(json.dumps(report, indent=2))
    if args.data_dir is None:  # never delete a caller-owned index
        shutil.rmtree(work)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
