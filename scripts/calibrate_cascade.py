"""Unsupervised cascade calibration: pick the prescreen cap WITHOUT labels.

`measure_prescreen_coverage.py` picks the cascade operating point from
labeled (query, gold) pairs — which a new deployment rarely has. This
script calibrates from QUERY STRINGS ALONE: for a sample of queries it
captures the engine's real rerank candidate groups, scores each group
both at full length and truncated to each candidate cap, and measures
how well the truncated ranking AGREES with the full one:

    containment_top1   P(full-length top-1 candidate survives the
                       prescreen's top-``keep``) — the quantity cascade
                       recall@1 actually depends on, gold-free
    containment_top3   same for the full top-3 (recall@10 proxy)
    overlap_at_keep    |top-keep(cap) ∩ top-keep(full)| / keep

The recommended cap is the smallest whose containment_top1 clears
``--top1-floor``. The default floor 0.95 is validated against BOTH
labeled corpora (docs/performance.md): it reproduces cap 32 on 22-word
documents (labeled coverage table) and cap 24 on 110-word documents
(containment 0.953 there, and the labeled end-to-end eval shows 24,8 is
quality-LOSSLESS — the ~5% of groups where the full top-1 misses the
prescreen top-keep are margin noise that ordinal composition absorbs,
since pruned candidates stay in the results banded below the rescored
set). A stricter 0.98 floor would refuse truncation entirely on the
long corpus; use it if recall@1 is sacred and throughput is not.

    python scripts/calibrate_cascade.py --out runs/cascade_calibration.json
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


def containment_metrics(
    full_scores: list[float], cap_scores: list[float], keep: int
) -> tuple[bool, bool, float]:
    """Agreement of a truncated prescreen with the full-length ranking.

    Returns (full top-1 in prescreen top-keep, full top-3 all in prescreen
    top-keep, |top-keep ∩ top-keep| / keep) — the per-group quantities the
    calibration averages. Label-free: 'full-length top-1' stands in for
    gold (the trained rerankers rank gold top-1 in >=0.99 of groups).
    """
    n = len(full_scores)
    full_order = sorted(range(n), key=lambda i: full_scores[i], reverse=True)
    cap_top = set(
        sorted(range(n), key=lambda i: cap_scores[i], reverse=True)[:keep]
    )
    top3 = full_order[: min(3, n)]
    return (
        full_order[0] in cap_top,
        len(set(top3) & cap_top) == len(top3),
        len(set(full_order[:keep]) & cap_top) / keep,
    )


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--out", type=Path, default=Path("runs/cascade_calibration.json")
    )
    parser.add_argument(
        "--embedder", type=Path, default=Path("runs/embedder/checkpoint")
    )
    parser.add_argument(
        "--reranker", type=Path, default=Path("runs/reranker/checkpoint")
    )
    parser.add_argument("--n-decls", type=int, default=5000)
    parser.add_argument("--n-concepts", type=int, default=600)
    parser.add_argument("--n-queries", type=int, default=192)
    parser.add_argument("--rerank-top", type=int, default=50)
    parser.add_argument("--keep", type=int, default=8)
    parser.add_argument("--body-sentences", type=int, default=1)
    parser.add_argument("--emb-max-length", "--serve-max-length", type=int, default=64)
    parser.add_argument("--rr-max-length", "--client-max-length", type=int, default=128)
    parser.add_argument(
        "--caps", type=int, nargs="+", default=[8, 16, 24, 32, 48, 64, 96]
    )
    parser.add_argument("--top1-floor", type=float, default=0.95)
    parser.add_argument(
        "--data-dir", type=str, default=None,
        help="calibrate against an EXISTING artifact directory "
        "(declarations.db + manifest, e.g. a served index or a "
        "train_*_e2e.py run's artifacts/) instead of rebuilding and "
        "re-embedding the corpus — the real deployment shape. Corpus "
        "args still generate the probe QUERIES and must match the "
        "index's corpus.",
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", choices=("cpu", "tpu"), default="tpu")
    args = parser.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import asyncio

    import numpy as np

    from lean_explore_tpu.index import build_index_artifacts, load_index_artifacts
    from lean_explore_tpu.models import DeclarationStore
    from lean_explore_tpu.search.engine import SearchEngine
    from lean_explore_tpu.train.synthetic import make_corpus
    from lean_explore_tpu.util.embedding_client import EmbeddingClient
    from lean_explore_tpu.util.reranker_client import RerankerClient

    corpus = make_corpus(
        n_decls=args.n_decls,
        n_concepts=args.n_concepts,
        n_eval=args.n_queries,
        seed=args.seed,
        body_sentences=args.body_sentences,
    )
    # LABELS ARE NOT USED: only the query strings. A real deployment
    # substitutes a sample of its own user queries here.
    queries = [q for q, _ in corpus.eval_queries]

    emb_client = EmbeddingClient(
        str(args.embedder), max_length=args.emb_max_length, batch_size=256,
        dtype="float32",
    )

    if args.data_dir is not None:
        # Calibrate against an EXISTING index — the real deployment
        # shape (the corpus is already embedded and served; only the
        # cascade cap is in question), and it skips the corpus embed.
        work = Path(args.data_dir)
        store = DeclarationStore(work / "declarations.db")

        from lean_explore_tpu.evaluation import guard_store_vocab

        # A caller-owned index can mismatch the checkpoints just as
        # silently as a rebuilt one — guard both paths.
        guard_store_vocab(store, emb_client.tokenizer)
    else:
        work = args.out.parent / "calibrate_work"
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

    # Capture the engine's real candidate groups AND their full-length
    # scores from one normal serving pass.
    groups: list[tuple[str, list[str], list[float]]] = []
    orig = client.rerank_grouped_sync

    def recording(qs, docs_grouped, **kw):
        scores = orig(qs, docs_grouped, **kw)
        if not kw.get("suffix_cap"):
            for q, d, s in zip(qs, docs_grouped, scores):
                groups.append((q, d, list(map(float, s))))
        return scores

    client.rerank_grouped_sync = recording
    engine = SearchEngine(
        str(work),
        store=store,
        artifacts=load_index_artifacts(str(work), mesh=False),
        embedding_client=emb_client,
        reranker_client=client,
    )
    asyncio.run(engine.search_batch(queries, rerank_top=args.rerank_top))
    client.rerank_grouped_sync = orig
    log(f"captured {len(groups)} candidate groups")

    doc_words = [len(d.split()) for _, ds, _ in groups for d in ds]
    report = {
        "task": {
            "n_decls": args.n_decls,
            "n_queries": len(queries),
            "rerank_top": args.rerank_top,
            "keep": args.keep,
            "body_sentences": args.body_sentences,
            "top1_floor": args.top1_floor,
            "labels_used": False,
        },
        "doc_words": {
            "median": float(np.median(doc_words)),
            "p90": float(np.percentile(doc_words, 90)),
        },
        "caps": {},
    }

    keep = args.keep
    for cap in args.caps:
        t0 = time.perf_counter()
        top1_hits, top3_hits, overlaps, n = 0, 0, 0.0, 0
        B = 64
        for start in range(0, len(groups), B):
            chunk = groups[start : start + B]
            cap_scores = orig(
                [q for q, _, _ in chunk],
                [d for _, d, _ in chunk],
                suffix_cap=cap,
            )
            for (q, docs, full), s in zip(chunk, cap_scores):
                hit1, hit3, overlap = containment_metrics(full, list(s), keep)
                top1_hits += hit1
                top3_hits += hit3
                overlaps += overlap
                n += 1
        row = {
            "containment_top1": round(top1_hits / n, 4),
            "containment_top3": round(top3_hits / n, 4),
            "overlap_at_keep": round(overlaps / n, 4),
            "n": n,
            "seconds": round(time.perf_counter() - t0, 1),
        }
        report["caps"][cap] = row
        log(f"cap={cap}: {json.dumps(row)}")

    recommended = next(
        (
            cap
            for cap in sorted(args.caps)
            if report["caps"][cap]["containment_top1"] >= args.top1_floor
        ),
        None,
    )
    report["recommended_cap"] = recommended
    log(f"recommended cap: {recommended}")

    args.out.write_text(json.dumps(report, indent=2))
    if args.data_dir is None:  # never delete a caller-owned index
        shutil.rmtree(work)
    print(json.dumps({"recommended_cap": recommended, "caps": report["caps"]}))


if __name__ == "__main__":
    main()
