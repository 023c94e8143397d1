"""Per-query-class signal attribution: which signal wins which query class.

Round-3 verdict: the committed eval showed the default hybrid pipeline
scoring WORSE than dense-only (recall@1 0.0 vs 0.266) with bm25_only at 0.0
everywhere — structural, because the synonym-phrased semantic queries carry
zero name-token overlap by design, so name-BM25 injects pure RRF noise. But
the reference's headline use case is *name* search (ref README.md:24), which
that eval never exercised. This script evaluates every engine configuration
on BOTH query classes (semantic synonym queries + the three name-query
classes from train/synthetic.make_name_queries) so each signal's
contribution is measured where it is supposed to help:

- name_exact / name_fragment -> BM25 (raw / spaced index) should win;
- name_typo                  -> fuzzy-name boost should recover rank 1;
- semantic                   -> dense (trained embedder) + trained rerank.

    python scripts/eval_query_classes.py --out runs/query_classes

Requires runs/embedder/checkpoint and runs/reranker/checkpoint (train them
with scripts/train_embedder_e2e.py / train_reranker_e2e.py).
"""

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", type=Path, default=Path("runs/query_classes"))
    parser.add_argument("--report", type=Path, default=None)
    parser.add_argument(
        "--embedder", type=Path, default=Path("runs/embedder/checkpoint")
    )
    parser.add_argument(
        "--reranker", type=Path, default=Path("runs/reranker/checkpoint")
    )
    # Corpus args MUST match the committed training runs.
    parser.add_argument("--n-decls", type=int, default=20_000)
    parser.add_argument("--n-concepts", type=int, default=1200)
    parser.add_argument("--n-eval", type=int, default=512)
    parser.add_argument("--n-per-class", type=int, default=128)
    parser.add_argument("--rerank-top", type=int, default=50)
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
    from lean_explore_tpu.train.synthetic import make_corpus, make_name_queries
    from lean_explore_tpu.util.embedding_client import EmbeddingClient
    from lean_explore_tpu.util.reranker_client import RerankerClient

    for ckpt in (args.embedder, args.reranker):
        if not (ckpt / "model.safetensors").exists():
            sys.exit(f"missing checkpoint: {ckpt}")

    out = args.out
    out.mkdir(parents=True, exist_ok=True)

    log(f"building corpus (n={args.n_decls}) ...")
    corpus = make_corpus(
        n_decls=args.n_decls,
        n_concepts=args.n_concepts,
        n_eval=args.n_eval,
        seed=args.seed,
    )
    query_sets: dict[str, list[tuple[str, str]]] = {
        "semantic": corpus.eval_queries,
        **make_name_queries(
            corpus, np.random.default_rng(args.seed + 3),
            n_per_class=args.n_per_class,
        ),
    }

    work = out / "work"
    if work.exists():
        shutil.rmtree(work)
    work.mkdir(parents=True)
    store = DeclarationStore(work / "declarations.db", create=True)
    store.insert_many(corpus.declarations)

    log("embedding corpus with the trained embedder ...")
    emb_client = EmbeddingClient(
        str(args.embedder), max_length=64, batch_size=256, dtype="float32"
    )
    ids, texts = [], []
    for decl in store.iter_all(with_embeddings=False):
        ids.append(decl.id)
        texts.append(decl.informalization)
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
            max_length=128, dtype="float32",
        ),
    )

    configs = {
        "bm25_only": dict(dense_k=0, rerank_top=0),
        "dense_only": dict(bm25_k=0, rerank_top=0),
        "hybrid_no_rerank": dict(rerank_top=0),
        "full_pipeline": dict(rerank_top=args.rerank_top),
    }
    report: dict = {
        "task": {
            "n_decls": args.n_decls,
            "query_sets": {k: len(v) for k, v in query_sets.items()},
            "embedder": str(args.embedder),
            "reranker": str(args.reranker),
        },
        "results": {},
    }
    for qclass, labeled in query_sets.items():
        report["results"][qclass] = {}
        for label, overrides in configs.items():
            t0 = time.perf_counter()
            row = evaluate_engine(engine, labeled, **overrides)
            row["seconds"] = round(time.perf_counter() - t0, 1)
            report["results"][qclass][label] = row
            log(f"{qclass}/{label}: {json.dumps(row)}")

    payload = json.dumps(report, indent=2)
    (out / "eval.json").write_text(payload)
    if args.report:
        args.report.write_text(payload)
    shutil.rmtree(work)
    print(json.dumps(report["results"]))


if __name__ == "__main__":
    main()
