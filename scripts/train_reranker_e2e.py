"""Train the cross-encoder reranker, then serve and eval the FULL pipeline.

Round-3 state: every pipeline stage had trained weights EXCEPT the reranker
— the component the reference's final ranking weighs highest (reference
search/engine.py:398-408, weight 1.0). This script closes that gap with the
in-repo training stack (train/cross_encoder.py): it rebuilds the same
Lean-shaped synthetic corpus the committed embedder was trained on
(runs/embedder, deterministic via seed), trains a Qwen3-architecture
cross-encoder on labeled (query, document, match?) triples with
concept-overlap HARD negatives, exports it in HF format, and evaluates the
complete hybrid pipeline — dense + BM25 + RRF + dep boost + trained rerank
fusion — against its ablations through the real engine.

    python scripts/train_reranker_e2e.py --out runs/reranker \
        --embedder runs/embedder/checkpoint

The exported checkpoint is a drop-in for serving:

    LEAN_EXPLORE_RERANKER_MODEL=runs/reranker/checkpoint lean-explore ...

Committed result: see runs/reranker/eval.json and docs/training.md.
"""

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERY_PROMPT = "query : "


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", type=Path, default=Path("runs/reranker"))
    parser.add_argument("--report", type=Path, default=None)
    parser.add_argument(
        "--embedder", type=Path, default=Path("runs/embedder/checkpoint"),
        help="trained embedder checkpoint (scripts/train_embedder_e2e.py)",
    )
    # Corpus args MUST match the embedder run so the task is identical.
    parser.add_argument("--n-decls", type=int, default=20_000)
    parser.add_argument("--n-concepts", type=int, default=1200)
    parser.add_argument("--n-eval", type=int, default=512)
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--learning-rate", type=float, default=3e-4)
    parser.add_argument("--hidden-size", type=int, default=256)
    parser.add_argument("--num-layers", type=int, default=4)
    parser.add_argument("--max-length", type=int, default=96)
    parser.add_argument(
        "--body-sentences", type=int, default=1,
        help="body sentences per document (5 ~= production-length ~110-word "
        "docs — the committed runs/longdoc regime; raise "
        "--max-length/--client-max-length/--serve-max-length too)",
    )
    parser.add_argument(
        "--client-max-length", "--rr-max-length", type=int, default=128,
        help="RerankerClient pair max_length at direct/pipeline eval "
        "(--rr-max-length is the same flag's name in the eval scripts)",
    )
    parser.add_argument(
        "--serve-max-length", "--emb-max-length", type=int, default=64,
        help="EmbeddingClient max_length for corpus embedding",
    )
    parser.add_argument("--rerank-top", type=int, default=50)
    parser.add_argument(
        "--truncation-augment", type=float, default=0.0,
        help="probability of truncating an example's document to a random "
        "token cap, byte-matching the cascade prescreen's truncation. "
        "MEASURED NEGATIVE at 200k scale, twice: caps (8,96) p=0.25 18k "
        "steps drags full-length direct recall 0.994 -> 0.719; the "
        "diagnosed fix (title-preserving caps (24,96), +6k steps) "
        "regressed 5.8x further to 0.125 — deleting body prose teaches "
        "title-lexical matching and destroys query-paraphrase "
        "generalization, invisibly to train accuracy "
        "(docs/performance.md 'Truncation-augmented training'). Kept "
        "off-default as the documented experiment.",
    )
    parser.add_argument(
        "--truncation-caps", type=int, nargs=2, default=(24, 96),
        metavar=("LO", "HI"),
        help="random cap range for --truncation-augment. Title-preserving "
        "LO (>=24 at production length) removes the label-noise failure "
        "mode but NOT the paraphrase-generalization collapse — see "
        "--truncation-augment.",
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--no-name-variants", action="store_true",
        help="train on name+title query forms only (the CI miniature uses "
        "this: fewer forms converge at few hundred steps on CPU)",
    )
    parser.add_argument(
        "--platform", choices=("cpu", "tpu"), default="tpu",
        help="tpu amortizes the 3000 fwd+bwd steps; cpu for smoke tests",
    )
    args = parser.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from lean_explore_tpu.evaluation import evaluate_engine
    from lean_explore_tpu.index import build_index_artifacts, load_index_artifacts
    from lean_explore_tpu.models import DeclarationStore
    from lean_explore_tpu.models.qwen3 import Qwen3Config
    from lean_explore_tpu.models.tokenizer import load_tokenizer
    from lean_explore_tpu.parallel import TRAIN_AXES, make_mesh
    from lean_explore_tpu.search.engine import SearchEngine
    from lean_explore_tpu.train import (
        CrossEncoderDataLoader,
        init_train_state,
        make_ce_train_step,
        make_optimizer,
    )
    from lean_explore_tpu.train.cross_encoder import format_pair
    from lean_explore_tpu.train.export import export_hf_checkpoint
    from lean_explore_tpu.train.synthetic import (
        build_wordlevel_tokenizer,
        make_corpus,
        make_reranker_examples,
        reranker_document,
    )
    from lean_explore_tpu.util.embedding_client import EmbeddingClient
    from lean_explore_tpu.util.reranker_client import RerankerClient

    if not (args.embedder / "model.safetensors").exists():
        sys.exit(
            f"no embedder checkpoint at {args.embedder} — run "
            "scripts/train_embedder_e2e.py first (or pass --embedder)"
        )

    out = args.out
    out.mkdir(parents=True, exist_ok=True)

    # ------------------------------------------------------------------ data
    log(f"building Lean-shaped corpus (n={args.n_decls}) ...")
    corpus = make_corpus(
        n_decls=args.n_decls,
        n_concepts=args.n_concepts,
        n_eval=args.n_eval,
        seed=args.seed,
        body_sentences=args.body_sentences,
    )
    data_dir = out / "data"
    if data_dir.exists():
        shutil.rmtree(data_dir)
    data_dir.mkdir(parents=True)
    store = DeclarationStore(data_dir / "declarations.db", create=True)
    store.insert_many(corpus.declarations)

    # Reranker tokenizer: corpus texts + the pair template + the scored
    # true/false tokens (its vocabulary differs from the embedder's, which
    # never sees the template).
    tok_dir = build_wordlevel_tokenizer(
        corpus.texts(),
        out / "tokenizer",
        extra_texts=(format_pair("q", "d"), "true false"),
    )
    tokenizer = load_tokenizer(tok_dir)
    for tok in ("true", "false"):
        tid = tokenizer.convert_tokens_to_ids(tok)
        assert tid is not None and tid != tokenizer.unk_token_id, tok
    vocab_size = ((tokenizer.vocab_size + 7) // 8) * 8
    log(f"tokenizer: {tokenizer.vocab_size} tokens (vocab padded {vocab_size})")

    rng = np.random.default_rng(args.seed + 1)
    examples = make_reranker_examples(
        corpus, rng, name_variants=not args.no_name_variants
    )
    n_pos = sum(1 for _, _, y in examples if y)
    log(f"{len(examples)} labeled examples ({n_pos} positive)")

    # ----------------------------------------------------------------- train
    config = Qwen3Config(
        vocab_size=vocab_size,
        hidden_size=args.hidden_size,
        num_hidden_layers=args.num_layers,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=args.hidden_size // 4,
        intermediate_size=args.hidden_size * 2,
    )
    mesh = make_mesh((len(jax.devices()), 1), axis_names=TRAIN_AXES)
    import optax

    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=args.learning_rate,
        warmup_steps=min(200, args.steps // 10 + 1),
        decay_steps=args.steps,
        end_value=args.learning_rate * 0.05,
    )
    optimizer = make_optimizer(learning_rate=schedule)
    params, opt_state = init_train_state(config, mesh, optimizer, seed=args.seed)

    random_ckpt = export_hf_checkpoint(
        params, config, out / "random_checkpoint", tokenizer_dir=tok_dir
    )

    token_true = int(tokenizer.convert_tokens_to_ids("true"))
    token_false = int(tokenizer.convert_tokens_to_ids("false"))
    step_fn = make_ce_train_step(
        config, mesh, optimizer, token_true=token_true, token_false=token_false
    )
    loader = CrossEncoderDataLoader(
        tokenizer, examples,
        batch_size=args.batch_size,
        max_length=args.max_length,
        seed=args.seed,
        truncation_augment=args.truncation_augment,
        truncation_caps=tuple(args.truncation_caps),
    )
    batches = iter(loader)
    t0 = time.perf_counter()
    history = []
    for step in range(1, args.steps + 1):
        params, opt_state, metrics = step_fn(params, opt_state, next(batches))
        if step % 200 == 0 or step == args.steps:
            loss = float(metrics["loss"])
            acc = float(metrics["accuracy"])
            history.append({"step": step, "loss": round(loss, 4),
                            "accuracy": round(acc, 4)})
            rate = args.batch_size * 200 / (time.perf_counter() - t0)
            t0 = time.perf_counter()
            log(f"step {step}/{args.steps} loss {loss:.4f} "
                f"acc {acc:.3f} ({rate:.0f} pairs/s)")

    trained_ckpt = export_hf_checkpoint(
        params, config, out / "checkpoint", tokenizer_dir=tok_dir
    )
    log(f"exported trained reranker checkpoint: {trained_ckpt}")

    report = {
        "task": {
            "n_decls": args.n_decls,
            "n_concepts": args.n_concepts,
            "body_sentences": args.body_sentences,
            "n_train_decls": corpus.n_train,
            "n_eval_queries": len(corpus.eval_queries),
            "n_examples": len(examples),
            "n_positive": n_pos,
            "negatives": "1 concept-overlap hard + 1 random per positive",
            "steps": args.steps,
            "batch_size": args.batch_size,
            "model": {
                "hidden_size": config.hidden_size,
                "num_hidden_layers": config.num_hidden_layers,
                "vocab_size": config.vocab_size,
            },
        },
        "train_history": history,
        "reranker_direct": {},
        "pipeline": {},
    }

    # ------------------------------------------------- direct reranker metric
    # Isolates the cross-encoder from retrieval: each held-out query scores
    # its target doc against 49 random held-out distractors; recall@1 is
    # "does P(true) rank the true pair first". Random init ~= 1/50.
    name_to_idx = {d.name: i for i, d in enumerate(corpus.declarations)}
    holdout_range = (corpus.n_train, len(corpus.declarations))
    for label, ckpt in (("random_init", random_ckpt), ("trained", trained_ckpt)):
        client = RerankerClient(
            str(ckpt), model_dir=ckpt, max_length=args.client_max_length,
            dtype="float32"
        )
        d_rng = np.random.default_rng(args.seed + 2)
        queries, docs_grouped, hits = [], [], 0
        for q, target in corpus.eval_queries:
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
        t0 = time.perf_counter()
        grouped = client.rerank_grouped_sync(queries, docs_grouped)
        for scores in grouped:
            if int(np.argmax(scores)) == 0:
                hits += 1
        recall1 = hits / len(queries)
        report["reranker_direct"][label] = {
            "recall_at_1_of_50": round(recall1, 4),
            "n_queries": len(queries),
            "seconds": round(time.perf_counter() - t0, 1),
        }
        log(f"direct rerank {label}: recall@1/50 = {recall1:.4f}")

    # ------------------------------------------------------- pipeline eval
    log("embedding corpus with the trained embedder ...")
    emb_client = EmbeddingClient(
        str(args.embedder), max_length=args.serve_max_length,
        batch_size=256, dtype="float32"
    )
    ids, texts = [], []
    for decl in store.iter_all(with_embeddings=False):
        ids.append(decl.id)
        texts.append(decl.informalization)
    vecs = emb_client.embed_sync(texts, is_query=False)
    store.set_embeddings(list(zip(ids, (v.tolist() for v in vecs))))

    art_dir = out / "artifacts"
    if art_dir.exists():
        shutil.rmtree(art_dir)
    art_dir.mkdir(parents=True)
    shutil.copy(data_dir / "declarations.db", art_dir / "declarations.db")
    build_index_artifacts(store, art_dir)

    rr_trained = RerankerClient(
        str(trained_ckpt), model_dir=trained_ckpt,
        max_length=args.client_max_length, dtype="float32",
    )
    rr_random = RerankerClient(
        str(random_ckpt), model_dir=random_ckpt,
        max_length=args.client_max_length, dtype="float32",
    )

    def make_engine(reranker) -> SearchEngine:
        return SearchEngine(
            str(art_dir),
            store=store,
            artifacts=load_index_artifacts(str(art_dir), mesh=False),
            embedding_client=emb_client,
            reranker_client=reranker,
        )

    engine_t = make_engine(rr_trained)
    grid = {
        "dense_only": dict(engine=engine_t, bm25_k=0, rerank_top=0),
        "hybrid_no_rerank": dict(engine=engine_t, rerank_top=0),
        "full_pipeline_trained": dict(engine=engine_t, rerank_top=args.rerank_top),
        "dense_rerank_trained": dict(
            engine=engine_t, bm25_k=0, rerank_top=args.rerank_top
        ),
        "full_pipeline_random_rerank": dict(
            engine=make_engine(rr_random), rerank_top=args.rerank_top
        ),
    }
    for label, cfg in grid.items():
        engine = cfg.pop("engine")
        t0 = time.perf_counter()
        report["pipeline"][label] = evaluate_engine(
            engine, corpus.eval_queries, **cfg
        )
        report["pipeline"][label]["seconds"] = round(
            time.perf_counter() - t0, 1
        )
        log(f"{label}: {json.dumps(report['pipeline'][label])}")

    payload = json.dumps(report, indent=2)
    (out / "eval.json").write_text(payload)
    if args.report:
        args.report.write_text(payload)
    print(json.dumps({k: report[k] for k in ("reranker_direct", "pipeline")}))


if __name__ == "__main__":
    main()
