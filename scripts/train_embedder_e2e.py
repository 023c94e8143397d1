"""Train the embedder with the in-repo stack, then serve and eval with it.

Real Qwen3 checkpoints are unreachable in this environment (PARITY.md), so
this script manufactures meaning from the inside: it builds a Lean-shaped
synthetic corpus whose retrieval task (synonym-phrased queries against
base-worded documents, targets held out of training) is learnable but not
solvable lexically, trains a small Qwen3-architecture embedder on
contrastive pairs from the standard loader (train/data.pairs_from_store),
exports the checkpoint in HF format, embeds the corpus with it, builds the
serving artifacts, and evaluates the full hybrid engine — trained vs
random-init — proving the text -> tokenizer -> model -> embedding -> index
-> serve loop end-to-end with non-random weights.

    python scripts/train_embedder_e2e.py --out runs/embedder \
        --report EVAL_TRAINED.json

The exported checkpoint is a drop-in for serving:

    LEAN_EXPLORE_EMBEDDING_MODEL=runs/embedder/checkpoint lean-explore search ...

Committed result (runs/embedder/eval.json, TPU v5e: 20k docs / 1200
concepts / 512 held-out queries, hidden 384 x 6 layers, 3000 steps,
--paraphrases): trained dense recall@10 0.840 / recall@1 0.578 /
MRR 0.661 vs random-init ~0.01; fused-selection recall@10 on the
trained (anisotropic) geometry 0.980. Tuning history, all measured:
batch 512 x 800 steps scored WORSE than batch 64 (0.184 vs 0.227 at
hidden 128 — fewer effective epochs, unscaled LR); capacity helped but
saturated (hidden 128 x 2L: 0.227; 256 x 4L: 0.592; 384 x 6L: 0.625);
the big lever was PHRASING DIVERSITY — titles expose each synonym in
one template, so --paraphrases (two extra templates, function words
disjoint from the eval template) took 384 x 6L from 0.625 to 0.840.
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
    parser.add_argument("--out", type=Path, default=Path("runs/embedder"))
    parser.add_argument("--report", type=Path, default=None,
                        help="write the eval JSON here as well")
    parser.add_argument("--n-decls", type=int, default=20_000)
    parser.add_argument("--n-concepts", type=int, default=1200)
    parser.add_argument("--n-eval", type=int, default=512)
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--learning-rate", type=float, default=3e-4)
    parser.add_argument("--hidden-size", type=int, default=256)
    parser.add_argument("--num-layers", type=int, default=4)
    parser.add_argument("--query-max-length", type=int, default=12)
    parser.add_argument("--doc-max-length", type=int, default=28)
    parser.add_argument(
        "--body-sentences", type=int, default=1,
        help="body sentences per document (5 ~= production-length ~110-word "
        "docs — the committed runs/longdoc regime; raise --doc-max-length "
        "and --serve-max-length to match)",
    )
    parser.add_argument(
        "--serve-max-length", "--emb-max-length", type=int, default=64,
        help="EmbeddingClient max_length for corpus embedding + eval "
        "(--emb-max-length is the same flag's name in the eval scripts)",
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--paraphrases", action="store_true",
        help="add paraphrased-synonym training pairs "
        "(train/synthetic.make_paraphrase_pairs): teaches phrasing "
        "invariance the single-template titles cannot",
    )
    parser.add_argument("--platform", choices=("cpu", "tpu"), default="cpu",
                        help="cpu is deterministic and safe anywhere; tpu "
                        "amortizes each step to the ~28ms dispatch floor")
    args = parser.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from lean_explore_tpu.evaluation import evaluate_engine
    from lean_explore_tpu.index import build_index_artifacts, load_index_artifacts
    from lean_explore_tpu.models import DeclarationStore
    from lean_explore_tpu.models.qwen3 import Qwen3Config
    from lean_explore_tpu.models.tokenizer import load_tokenizer
    from lean_explore_tpu.parallel import TRAIN_AXES, make_mesh
    from lean_explore_tpu.search.engine import SearchEngine
    from lean_explore_tpu.train import (
        ContrastiveDataLoader,
        init_train_state,
        make_optimizer,
        make_train_step,
        pairs_from_store,
    )
    from lean_explore_tpu.train.export import export_hf_checkpoint
    from lean_explore_tpu.train.synthetic import (
        build_wordlevel_tokenizer,
        make_corpus,
    )
    from lean_explore_tpu.util.embedding_client import EmbeddingClient

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

    extra_texts = (QUERY_PROMPT,)
    if args.paraphrases:
        from lean_explore_tpu.train.synthetic import _PARAPHRASE_TEMPLATES

        extra_texts += tuple(
            tpl.format(s0="", s1="", s2="") for tpl in _PARAPHRASE_TEMPLATES
        )
    tok_dir = build_wordlevel_tokenizer(
        corpus.texts(), out / "tokenizer", extra_texts=extra_texts
    )
    tokenizer = load_tokenizer(tok_dir)
    vocab_size = ((tokenizer.vocab_size + 7) // 8) * 8
    log(f"tokenizer: {tokenizer.vocab_size} tokens (vocab padded {vocab_size})")

    # Contrastive pairs from the standard loader, restricted to the train
    # split (eval targets live in the held-out tail and are never trained).
    train_docs = {
        d.informalization for d in corpus.declarations[: corpus.n_train]
    }
    raw_pairs = [
        (q, d) for q, d in pairs_from_store(store) if d in train_docs
    ]
    if args.paraphrases:
        from lean_explore_tpu.train.synthetic import make_paraphrase_pairs

        raw_pairs.extend(make_paraphrase_pairs(corpus))
    pairs = [(QUERY_PROMPT + q, d) for q, d in raw_pairs]
    log(f"{len(pairs)} training pairs over {corpus.n_train} declarations")

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

    # Snapshot the random init as the baseline checkpoint before training.
    random_ckpt = export_hf_checkpoint(
        params, config, out / "random_checkpoint",
        tokenizer_dir=tok_dir, query_prompt=QUERY_PROMPT,
    )

    step_fn = make_train_step(config, mesh, optimizer)
    loader = ContrastiveDataLoader(
        tokenizer, pairs,
        batch_size=args.batch_size,
        query_max_length=args.query_max_length,
        doc_max_length=args.doc_max_length,
        seed=args.seed,
    )
    batches = iter(loader)
    t0 = time.perf_counter()
    history = []
    for step in range(1, args.steps + 1):
        params, opt_state, metrics = step_fn(params, opt_state, next(batches))
        if step % 100 == 0 or step == args.steps:
            loss = float(metrics["loss"])
            acc = float(metrics["accuracy"])
            history.append({"step": step, "loss": round(loss, 4),
                            "accuracy": round(acc, 4)})
            rate = args.batch_size * (100 if step % 100 == 0 else step % 100)
            rate /= time.perf_counter() - t0
            t0 = time.perf_counter()
            log(f"step {step}/{args.steps} loss {loss:.4f} "
                f"acc {acc:.3f} ({rate:.0f} pairs/s)")

    trained_ckpt = export_hf_checkpoint(
        params, config, out / "checkpoint",
        tokenizer_dir=tok_dir, query_prompt=QUERY_PROMPT,
    )
    log(f"exported trained checkpoint: {trained_ckpt}")

    # ---------------------------------------------------------- serve + eval
    report = {
        "task": {
            "n_decls": args.n_decls,
            "n_concepts": args.n_concepts,
            "body_sentences": args.body_sentences,
            "n_train_decls": corpus.n_train,
            "n_eval_queries": len(corpus.eval_queries),
            "holdout": "eval targets excluded from training pairs",
            "steps": args.steps,
            "batch_size": args.batch_size,
            "model": {
                "hidden_size": config.hidden_size,
                "num_hidden_layers": config.num_hidden_layers,
                "vocab_size": config.vocab_size,
            },
        },
        "train_history": history,
        "results": {},
    }
    for label, ckpt in (("random_init", random_ckpt), ("trained", trained_ckpt)):
        log(f"embedding corpus + serving eval with {label} weights ...")
        client = EmbeddingClient(
            str(ckpt), max_length=args.serve_max_length, batch_size=256, dtype="float32"
        )
        ids, texts = [], []
        for decl in store.iter_all(with_embeddings=False):
            ids.append(decl.id)
            texts.append(decl.informalization)
        vecs = client.embed_sync(texts, is_query=False)
        store.set_embeddings(list(zip(ids, (v.tolist() for v in vecs))))

        art_dir = out / f"artifacts_{label}"
        if art_dir.exists():
            shutil.rmtree(art_dir)
        art_dir.mkdir(parents=True)
        shutil.copy(data_dir / "declarations.db", art_dir / "declarations.db")
        build_index_artifacts(store, art_dir)
        engine = SearchEngine(
            str(art_dir),
            store=store,
            artifacts=load_index_artifacts(str(art_dir), mesh=False),
            embedding_client=client,
        )
        report["results"][label] = {
            # rerank_top=0 explicitly: this script trains/evaluates the
            # EMBEDDER stages only — no reranker checkpoint exists yet
            # (train_reranker_e2e.py evaluates the full pipeline).
            "hybrid": evaluate_engine(
                engine, corpus.eval_queries, rerank_top=0
            ),
            "dense_only": evaluate_engine(
                engine, corpus.eval_queries, bm25_k=0, rerank_top=0
            ),
            "bm25_only": evaluate_engine(
                engine, corpus.eval_queries, dense_k=0, rerank_top=0
            ),
        }
        log(f"{label}: {json.dumps(report['results'][label])}")

    # Selection fidelity of the fused kernel on the *trained* (anisotropic,
    # non-synthetic) embedding geometry: fused bin-top-k vs the exact scan
    # over the same corpus matrix — the BENCH recall re-confirmation VERDICT
    # round 2 asked for, on real learned vectors rather than random ones.
    import jax.numpy as jnp

    from lean_explore_tpu.ops import dense_topk

    client = EmbeddingClient(
        str(trained_ckpt), max_length=args.serve_max_length, batch_size=256, dtype="float32"
    )
    q_vecs = client.embed_device(
        [q for q, _ in corpus.eval_queries[:128]], is_query=True
    )
    corpus_mat = jnp.asarray(
        np.stack(
            [
                np.asarray(d.informalization_embedding, dtype=np.float32)
                for d in store.iter_all()
            ]
        )
    )
    _, idx_exact = dense_topk(q_vecs, corpus_mat, 10, method="chunked")
    _, idx_fused = dense_topk(q_vecs, corpus_mat, 10, method="fused")
    idx_exact, idx_fused = np.asarray(idx_exact), np.asarray(idx_fused)
    overlap = float(
        np.mean(
            [
                len(set(idx_exact[i]) & set(idx_fused[i])) / 10
                for i in range(idx_exact.shape[0])
            ]
        )
    )
    report["fused_selection_on_trained_geometry"] = {
        "recall_at_10_vs_exact": round(overlap, 4),
        "n_rows": int(corpus_mat.shape[0]),
        "n_queries": int(idx_exact.shape[0]),
    }
    log(f"fused selection recall@10 on trained geometry: {overlap:.4f}")

    payload = json.dumps(report, indent=2)
    (out / "eval.json").write_text(payload)
    if args.report:
        args.report.write_text(payload)
    print(json.dumps(report["results"]))


if __name__ == "__main__":
    main()
