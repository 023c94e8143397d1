"""Retrieval-quality evaluation harness.

Measures recall@k and MRR of the hybrid engine against labeled
(query -> target declaration) pairs, with dense-only and BM25-only
ablations — the quality counterpart to bench.py's throughput numbers. The
reference ships no eval tooling (its paper used a one-off LLM-judge study);
this harness is how regressions in ranking quality get caught here.

Two modes:

    python scripts/eval_retrieval.py                      # synthetic corpus
    python scripts/eval_retrieval.py --data-dir DIR \
        --queries queries.jsonl                           # real artifacts

queries.jsonl lines: {"query": "...", "target": "Decl.name"}. Synthetic
mode builds an N-declaration corpus whose informalization embeddings are
noisy copies of their query embeddings, so the expected ranking is known.

Prints one JSON line with recall@{1,10}, MRR@10 per configuration.
"""

import argparse
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def build_synthetic(n: int, dim: int, noise: float, seed: int = 0):
    """Corpus + queries where query i's true target is declaration i."""
    from lean_explore_tpu.index import build_index_artifacts
    from lean_explore_tpu.models import Declaration, DeclarationStore

    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, dim)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    words = [f"w{i}" for i in range(2000)]

    tmp = tempfile.mkdtemp(prefix="eval_retrieval_")
    store = DeclarationStore(f"{tmp}/declarations.db", create=True)
    rows = []
    for i in range(n):
        # The word appears as its own name component so the lexical
        # signal is informative (like real Lean names); ~n/2000 share it.
        name = f"Pkg{i % 5}.ns{i % 31}.{words[i % 2000]}_{i}"
        rows.append(
            Declaration(
                name=name,
                module=f"Pkg{i % 5}.Mod{i % 17}",
                source_text=f"def {name} := x{i}",
                source_link=f"https://example/{i}",
                dependencies=None,
                informalization=f"**Thing {i}.** about {words[i % 2000]} "
                f"and {words[(i * 3) % 2000]}",
                informalization_embedding=base[i].tolist(),
            )
        )
        if len(rows) == 5000:
            store.insert_many(rows)
            rows = []
    if rows:
        store.insert_many(rows)
    build_index_artifacts(store, tmp)

    query_vecs = base + noise * rng.standard_normal((n, dim)).astype(np.float32)
    query_vecs /= np.linalg.norm(query_vecs, axis=1, keepdims=True)
    labeled = [
        # Query text shares tokens with the target's informalization so the
        # lexical signal is informative too.
        (f"{words[i % 2000]} thing number {(i * 7) % 50}",
         f"Pkg{i % 5}.ns{i % 31}.{words[i % 2000]}_{i}")
        for i in range(n)
    ]
    return tmp, store, query_vecs, labeled


class VectorEmbedder:
    """Maps each query string to its precomputed evaluation vector."""

    def __init__(self, mapping: dict[str, np.ndarray], dim: int):
        self.mapping = mapping
        self.dim = dim

    def embed_device(self, texts, is_query=False):
        import jax.numpy as jnp

        out = np.stack(
            [self.mapping.get(t, np.zeros(self.dim, np.float32)) for t in texts]
        )
        return jnp.asarray(out)

    async def embed(self, texts, is_query=False):
        from lean_explore_tpu.util.embedding_client import EmbeddingResponse

        vecs = np.asarray(self.embed_device(texts, is_query))
        return EmbeddingResponse(
            texts=list(texts), embeddings=vecs.tolist(), model="eval"
        )


def evaluate(engine, labeled, **kw) -> dict:
    """recall@1/@k and MRR@k for (query, target-name) pairs."""
    from lean_explore_tpu.evaluation import evaluate_engine

    return evaluate_engine(engine, labeled, **kw)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--n", type=int, default=20_000,
                        help="synthetic corpus size")
    parser.add_argument("--dim", type=int, default=256)
    parser.add_argument("--noise", type=float, default=0.35,
                        help="query-vs-target embedding noise")
    parser.add_argument("--queries", type=int, default=512,
                        help="labeled queries to evaluate")
    parser.add_argument("--data-dir", type=str, default=None,
                        help="evaluate real artifacts instead of synthetic")
    parser.add_argument("--queries-file", type=str, default=None,
                        help="jsonl of {query, target} for --data-dir mode")
    parser.add_argument("--min-recall10", type=float, default=None,
                        help="quality gate: exit 1 if hybrid recall@10 "
                             "falls below this floor (CI regression guard)")
    args = parser.parse_args()

    from lean_explore_tpu.index import load_index_artifacts
    from lean_explore_tpu.models import DeclarationStore
    from lean_explore_tpu.search.engine import SearchEngine

    if args.data_dir:
        if not args.queries_file:
            parser.error("--queries-file is required with --data-dir")
        labeled = [
            (row["query"], row["target"])
            for row in map(json.loads, Path(args.queries_file).read_text().splitlines())
        ]
        engine = SearchEngine(args.data_dir)
        # Real artifacts: evaluate the full serving path, including the
        # rerank stage (evaluate_engine's default rerank_top=50, the
        # serving default) — set LEAN_EXPLORE_RERANKER_MODEL to the
        # checkpoint to serve with.
        configs = {"hybrid": dict()}
    else:
        log(f"building synthetic corpus (n={args.n}, dim={args.dim}) ...")
        tmp, store, query_vecs, labeled_all = build_synthetic(
            args.n, args.dim, args.noise
        )
        rng = np.random.default_rng(1)
        picks = rng.choice(len(labeled_all), size=args.queries, replace=False)
        labeled = [labeled_all[i] for i in picks]
        mapping = {labeled_all[i][0]: query_vecs[i] for i in picks}
        embedder = VectorEmbedder(mapping, args.dim)
        engine = SearchEngine(
            tmp,
            store=store,
            artifacts=load_index_artifacts(tmp, mesh=False),
            embedding_client=embedder,
        )
        # rerank_top=0 explicitly: this harness gates retrieval GEOMETRY
        # (dense/BM25/fusion) with a synthetic vector embedder and no
        # reranker; the rerank-path quality gate is
        # tests/train/test_reranker_serve_eval.py.
        configs = {
            "hybrid": dict(rerank_top=0),
            "dense_only": dict(bm25_k=0, rerank_top=0),
            "bm25_only": dict(dense_k=0, rerank_top=0),
        }

    report = {}
    for label, overrides in configs.items():
        log(f"evaluating {label} ...")
        report[label] = evaluate(engine, labeled, **overrides)
    print(json.dumps(report))

    if args.min_recall10 is not None:
        got = report["hybrid"]["recall_at_10"]
        if got < args.min_recall10:
            log(
                f"QUALITY GATE FAILED: hybrid recall@10 {got:.4f} < "
                f"floor {args.min_recall10:.4f}"
            )
            sys.exit(1)
        log(
            f"quality gate ok: hybrid recall@10 {got:.4f} >= "
            f"{args.min_recall10:.4f}"
        )


if __name__ == "__main__":
    main()
