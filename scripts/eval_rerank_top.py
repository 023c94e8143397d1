"""Quality vs rerank_top: how many retrieval candidates must be reranked.

The config-4 pipeline reranks the hybrid top-50 per query (the
reference's local-search shape). But the cross-encoder's cost is linear
in rerank_top while retrieval already orders candidates well — if gold
is almost always inside the hybrid top-16, reranking 50 pays 3x the
dominant stage's FLOPs for candidates that never win. This measures
recall/MRR through the REAL engine with trained weights at every stage
for rerank_top in {8, 16, 25, 50}, each with and without the rerank
cascade (LEAN_EXPLORE_RERANK_CASCADE=32,8), so throughput levers can be
composed from data. Production-length throughput for the chosen points:
BENCH_RERANK_TOP=N [LEAN_EXPLORE_RERANK_CASCADE=32,8] BENCH_MODE=pipeline
BENCH_INFORMAL_WORDS=80 python bench.py (docs/performance.md).

    python scripts/eval_rerank_top.py --out runs/rerank_top_eval.json
"""

import argparse
import json
import os
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
        "--out", type=Path, default=Path("runs/rerank_top_eval.json")
    )
    parser.add_argument(
        "--embedder", type=Path, default=Path("runs/embedder/checkpoint")
    )
    parser.add_argument(
        "--reranker", type=Path, default=Path("runs/reranker/checkpoint")
    )
    parser.add_argument("--n-decls", type=int, default=20_000)
    parser.add_argument("--n-concepts", type=int, default=1200)
    parser.add_argument("--n-eval", type=int, default=512)
    parser.add_argument(
        "--rerank-tops", type=int, nargs="+", default=[50, 25, 16, 8]
    )
    parser.add_argument(
        "--cascade", type=str, default="32,8",
        help="cascade caps for the second arm at each rerank_top (pick "
        "the chain's calibrated point — scripts/calibrate_cascade.py)",
    )
    parser.add_argument(
        "--data-dir", type=str, default=None,
        help="evaluate against an EXISTING index (e.g. a train run's "
        "artifacts/) — skips the corpus embed; corpus args still "
        "generate the labeled eval queries and must match the index",
    )
    parser.add_argument(
        "--body-sentences", type=int, default=1,
        help="body sentences per document (match the index's corpus)",
    )
    parser.add_argument("--emb-max-length", type=int, default=64)
    parser.add_argument("--rr-max-length", type=int, default=128)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", choices=("cpu", "tpu"), default="tpu")
    args = parser.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

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
    emb_client = EmbeddingClient(
        str(args.embedder), max_length=args.emb_max_length, batch_size=256,
        dtype="float32",
    )

    if args.data_dir is not None:
        work = Path(args.data_dir)
        store = DeclarationStore(work / "declarations.db")

        from lean_explore_tpu.evaluation import guard_store_vocab

        guard_store_vocab(store, emb_client.tokenizer)
    else:
        work = args.out.parent / "rerank_top_work"
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

    engine = SearchEngine(
        str(work),
        store=store,
        artifacts=load_index_artifacts(str(work), mesh=False),
        embedding_client=emb_client,
        reranker_client=RerankerClient(
            str(args.reranker), model_dir=args.reranker,
            max_length=args.rr_max_length, dtype="float32",
        ),
    )

    report = {"task": {"n_decls": args.n_decls, "n_eval": args.n_eval,
                       "body_sentences": args.body_sentences,
                       "cascade": args.cascade,
                       "data_dir": args.data_dir},
              "results": {}}
    for top in args.rerank_tops:
        for cascade in (None, args.cascade):
            if cascade is None:
                os.environ.pop("LEAN_EXPLORE_RERANK_CASCADE", None)
                label = f"top{top}"
            else:
                os.environ["LEAN_EXPLORE_RERANK_CASCADE"] = cascade
                label = f"top{top}_cascade_{cascade.replace(',', '_')}"
            t0 = time.perf_counter()
            row = evaluate_engine(engine, corpus.eval_queries, rerank_top=top)
            row["seconds"] = round(time.perf_counter() - t0, 1)
            report["results"][label] = row
            log(f"{label}: {json.dumps(row)}")
    os.environ.pop("LEAN_EXPLORE_RERANK_CASCADE", None)

    args.out.write_text(json.dumps(report, indent=2))
    if args.data_dir is None:  # never delete a caller-owned index
        shutil.rmtree(work)
    print(json.dumps(report["results"]))


if __name__ == "__main__":
    main()
