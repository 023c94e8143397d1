"""Quality delta of the rerank cascade on the trained full pipeline.

The cascade (truncated stage-1 prescreen + full-length rescore of the
top-keep, ordinal composition) reaches 28.5 q/s at production document
lengths vs 14.5 for the parity path (docs/performance.md). This measures
what it costs in ranking quality through the REAL engine with trained
weights at every stage: full-pipeline recall/MRR with cascade off vs on.
Pick candidate operating points from scripts/measure_prescreen_coverage.py
first — quality tracks stage-1 gold coverage.

    python scripts/eval_cascade.py --out runs/cascade_eval.json
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
    parser.add_argument("--out", type=Path, default=Path("runs/cascade_eval.json"))
    parser.add_argument(
        "--embedder", type=Path, default=Path("runs/embedder/checkpoint")
    )
    parser.add_argument(
        "--reranker", type=Path, default=Path("runs/reranker/checkpoint")
    )
    parser.add_argument("--n-decls", type=int, default=20_000)
    parser.add_argument("--n-concepts", type=int, default=1200)
    parser.add_argument("--n-eval", type=int, default=512)
    parser.add_argument("--rerank-top", type=int, default=50)
    parser.add_argument(
        "--body-sentences", type=int, default=1,
        help="body sentences per doc (5 ~= production length, ~110-word "
        "docs; raise the max-lengths to match)",
    )
    parser.add_argument("--emb-max-length", "--serve-max-length", type=int, default=64)
    parser.add_argument("--rr-max-length", "--client-max-length", type=int, default=128)
    parser.add_argument(
        "--points", type=str, nargs="+", default=None,
        help="cascade operating points as '<cap>,<keep>' (default sweep "
        "spans the coverage cliff measured on the 22-word corpus)",
    )
    parser.add_argument(
        "--data-dir", type=str, default=None,
        help="evaluate against an EXISTING artifact directory instead of "
        "rebuilding and re-embedding the corpus; corpus args still "
        "generate the labeled eval queries and must match the index.",
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", choices=("cpu", "tpu"), default="tpu")
    args = parser.parse_args()

    default_points = ["32,16", "32,8", "24,12", "16,12", "12,8", "12,25"]
    points = args.points if args.points else default_points
    for p in points:  # fail in milliseconds, not after the embed pass
        try:
            cap, keep = (int(x) for x in p.split(","))
            if cap <= 0 or keep <= 0:
                raise ValueError
        except ValueError:
            raise SystemExit(
                f"--points entry {p!r} must be '<cap>,<keep>' positive ints"
            ) from None

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
        # Evaluate against an EXISTING index (e.g. a served artifact dir
        # or a train_*_e2e.py run's artifacts/) — skips the corpus
        # embed; corpus args still generate the labeled eval queries and
        # must match the index's corpus.
        work = Path(args.data_dir)
        store = DeclarationStore(work / "declarations.db")

        from lean_explore_tpu.evaluation import guard_store_vocab

        # A caller-owned index can mismatch the checkpoints just as
        # silently as a rebuilt one — guard both paths.
        guard_store_vocab(store, emb_client.tokenizer)
    else:
        work = args.out.parent / "cascade_work"
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
                       "body_sentences": args.body_sentences},
              "results": {}}
    # Operating points: the prescreen token budget is the quality lever
    # (gold top-16 coverage at stage 1: ~100% at 32 doc tokens, ~50% at
    # 12 — measured prescreen-coverage table in docs/performance.md).
    # 12,25 stays as the illustration that a larger keep cannot rescue a
    # lossy prescreen.
    for label, env in (
        ("full_pipeline", None),
        *((f"cascade_{p.replace(',', '_')}", p) for p in points),
    ):
        if env is None:
            os.environ.pop("LEAN_EXPLORE_RERANK_CASCADE", None)
        else:
            os.environ["LEAN_EXPLORE_RERANK_CASCADE"] = env
        t0 = time.perf_counter()
        row = evaluate_engine(
            engine, corpus.eval_queries, rerank_top=args.rerank_top
        )
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
