"""Measure int8 effects on TRAINED geometry: dense recall + reranker drift.

Two numbers round-3 VERDICT asked for, both previously known only on
random/isotropic data:

1. Dense int8 selection recall on the trained embedder's (anisotropic)
   corpus geometry — the configuration recommended "when HBM capacity is
   the constraint" (config 5): embed the synthetic corpus with
   runs/embedder/checkpoint, then compare the int8 fused kernel's top-10
   against the exact f32 scan.
2. Cross-encoder int8 score drift on the trained reranker
   (runs/reranker/checkpoint): P(true) drift and ranking agreement of the
   int8 client vs the f32 client on the held-out direct-eval pairs, plus
   recall@1-of-50 under both.

    python scripts/measure_int8_effects.py --out runs/int8_effects.json
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--out", type=Path, default=Path("runs/int8_effects.json")
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
    parser.add_argument("--n-queries", type=int, default=128)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", choices=("cpu", "tpu"), default="tpu")
    args = parser.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from lean_explore_tpu.ops import dense_topk
    from lean_explore_tpu.ops.quant import _quantize_rows_device, quantized_topk
    from lean_explore_tpu.train.synthetic import make_corpus, reranker_document
    from lean_explore_tpu.util.embedding_client import EmbeddingClient
    from lean_explore_tpu.util.reranker_client import RerankerClient

    report: dict = {}
    corpus = make_corpus(
        n_decls=args.n_decls,
        n_concepts=args.n_concepts,
        n_eval=args.n_eval,
        seed=args.seed,
    )

    # ---------------------------------------------- 1. dense int8 selection
    log("embedding corpus with trained embedder ...")
    client = EmbeddingClient(
        str(args.embedder), max_length=64, batch_size=256, dtype="float32"
    )
    corpus_mat = jnp.asarray(
        client.embed_sync(
            [d.informalization for d in corpus.declarations], is_query=False
        )
    )
    q_vecs = client.embed_device(
        [q for q, _ in corpus.eval_queries[: args.n_queries]], is_query=True
    )
    n = int(corpus_mat.shape[0])
    _, idx_exact = dense_topk(q_vecs, corpus_mat, 10, method="chunked")
    # Tile-align rows the way DenseIndex does at load time.
    pad = (-n) % 512
    padded = (
        jnp.concatenate(
            [corpus_mat, jnp.zeros((pad, corpus_mat.shape[1]), jnp.float32)]
        )
        if pad
        else corpus_mat
    )
    codes, scales = _quantize_rows_device(padded)
    rows = {}
    for label, (s, idx) in {
        "fused_f32_vs_exact": dense_topk(q_vecs, corpus_mat, 10, method="fused"),
        "int8_vs_exact": quantized_topk(
            q_vecs, codes, scales, jnp.asarray(n, jnp.int32), k=10
        ),
    }.items():
        idx_np, exact_np = np.asarray(idx), np.asarray(idx_exact)
        overlap = float(
            np.mean(
                [
                    len(set(exact_np[i]) & set(idx_np[i, :10])) / 10
                    for i in range(exact_np.shape[0])
                ]
            )
        )
        rows[label] = round(overlap, 4)
        log(f"dense {label}: recall@10 {overlap:.4f}")
    report["dense_trained_geometry"] = {
        "n_rows": n,
        "n_queries": int(np.asarray(idx_exact).shape[0]),
        "recall_at_10": rows,
    }

    # ------------------------------------------- 2. reranker int8 drift
    log("scoring direct-eval pairs with f32 and int8 rerankers ...")
    f32 = RerankerClient(
        str(args.reranker), model_dir=args.reranker, max_length=128,
        dtype="float32",
    )
    q8 = RerankerClient(
        str(args.reranker), model_dir=args.reranker, max_length=128,
        dtype="int8",
    )
    name_to_idx = {d.name: i for i, d in enumerate(corpus.declarations)}
    holdout_range = (corpus.n_train, len(corpus.declarations))
    d_rng = np.random.default_rng(args.seed + 2)
    queries, docs_grouped = [], []
    for q, target in corpus.eval_queries[: args.n_queries]:
        ti = name_to_idx[target]
        distractors = []
        while len(distractors) < 49:
            j = int(d_rng.integers(*holdout_range))
            if j != ti:
                distractors.append(j)
        docs = [reranker_document(corpus.declarations[ti])] + [
            reranker_document(corpus.declarations[j]) for j in distractors
        ]
        queries.append(q)
        docs_grouped.append(docs)

    got_f32 = f32.rerank_grouped_sync(queries, docs_grouped)
    got_q8 = q8.rerank_grouped_sync(queries, docs_grouped)
    a = np.asarray(got_f32)
    b = np.asarray(got_q8)
    drift = np.abs(a - b)
    top1_f32 = (np.argmax(a, axis=1) == 0).mean()
    top1_q8 = (np.argmax(b, axis=1) == 0).mean()
    top1_agree = (np.argmax(a, axis=1) == np.argmax(b, axis=1)).mean()
    report["reranker_int8_drift"] = {
        "n_queries": len(queries),
        "pairs_per_query": 50,
        "p_true_drift_mean": round(float(drift.mean()), 5),
        "p_true_drift_max": round(float(drift.max()), 5),
        "recall_at_1_of_50_f32": round(float(top1_f32), 4),
        "recall_at_1_of_50_int8": round(float(top1_q8), 4),
        "top1_agreement": round(float(top1_agree), 4),
    }
    log(json.dumps(report["reranker_int8_drift"]))

    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(report, indent=2))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
