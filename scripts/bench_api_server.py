"""HTTP serving benchmark: what request coalescing buys on real hardware.

Measures the self-hosted /api/v2 server (lean_explore_tpu/api/server.py)
with trained weights at every stage, production-length documents, and the
validated rerank cascade, under three arms:

  direct      Service.search_batch(all queries) — no HTTP, the upper bound
  coalesced   N concurrent HTTP requests, one server with max_batch=N
  serialized  N concurrent HTTP requests, one server with max_batch=1
              (every request runs the single-query pipeline alone — what a
              non-batching HTTP front end would do)

All three arms run in one process on the bench host; HTTP client work
shares the host CPU with the server's own host stages, so the absolute
HTTP numbers are conservative on a 1-core host (disclosed in the output).

    python scripts/bench_api_server.py --out runs/api_server_bench.json
"""

import argparse
import asyncio
import json
import shutil
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


async def _fire(base_url: str, queries: list[str], limit: int) -> float:
    import httpx

    async with httpx.AsyncClient(
        timeout=600.0, headers={"Authorization": "Bearer bench"}
    ) as client:
        t0 = time.perf_counter()
        responses = await asyncio.gather(
            *(
                client.get(
                    f"{base_url}/search", params={"q": q, "limit": limit}
                )
                for q in queries
            )
        )
        elapsed = time.perf_counter() - t0
    for response in responses:
        response.raise_for_status()
        if not response.json()["results"]:
            raise RuntimeError("empty result set in benchmark arm")
    return elapsed


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", type=Path, default=Path("runs/api_server_bench.json"))
    parser.add_argument(
        "--embedder", type=Path, default=Path("runs/longdoc/embedder/checkpoint")
    )
    parser.add_argument(
        "--reranker", type=Path, default=Path("runs/longdoc/reranker/checkpoint")
    )
    parser.add_argument("--n-decls", type=int, default=20_000)
    parser.add_argument("--n-concepts", type=int, default=1200)
    parser.add_argument("--body-sentences", type=int, default=5)
    parser.add_argument("--emb-max-length", type=int, default=128)
    parser.add_argument("--rr-max-length", type=int, default=192)
    parser.add_argument("--cascade", type=str, default="24,8")
    parser.add_argument("--n-requests", type=int, default=128)
    parser.add_argument("--limit", type=int, default=10)
    parser.add_argument("--coalesce-ms", type=float, default=100.0)
    parser.add_argument("--serialized-requests", type=int, default=None,
                        help="request count for the serialized arm "
                        "(default: n-requests; lower it if impatient)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", choices=("cpu", "tpu"), default="tpu")
    args = parser.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import os

    os.environ["LEAN_EXPLORE_RERANK_CASCADE"] = args.cascade

    from lean_explore_tpu.api.server import serve
    from lean_explore_tpu.index import build_index_artifacts, load_index_artifacts
    from lean_explore_tpu.models import DeclarationStore
    from lean_explore_tpu.search.engine import SearchEngine
    from lean_explore_tpu.search.service import Service
    from lean_explore_tpu.train.synthetic import make_corpus
    from lean_explore_tpu.util.embedding_client import EmbeddingClient
    from lean_explore_tpu.util.reranker_client import RerankerClient

    corpus = make_corpus(
        n_decls=args.n_decls,
        n_concepts=args.n_concepts,
        n_eval=max(args.n_requests, 32),
        seed=args.seed,
        body_sentences=args.body_sentences,
    )
    work = args.out.parent / "api_bench_work"
    if work.exists():
        shutil.rmtree(work)
    work.mkdir(parents=True)
    store = DeclarationStore(work / "declarations.db", create=True)
    store.insert_many(corpus.declarations)

    log("embedding corpus ...")
    emb_client = EmbeddingClient(
        str(args.embedder), max_length=args.emb_max_length, batch_size=256,
        dtype="float32",
    )
    ids, texts = [], []
    for decl in store.iter_all(with_embeddings=False):
        ids.append(decl.id)
        texts.append(decl.informalization)
    vecs = emb_client.embed_sync(texts, is_query=False)
    store.set_embeddings(list(zip(ids, (v.tolist() for v in vecs))))
    build_index_artifacts(store, work)

    service = Service(
        engine=SearchEngine(
            str(work),
            store=store,
            artifacts=load_index_artifacts(str(work), mesh=False),
            embedding_client=emb_client,
            reranker_client=RerankerClient(
                str(args.reranker), model_dir=args.reranker,
                max_length=args.rr_max_length, dtype="float32",
            ),
        )
    )

    queries = [q for q, _ in corpus.eval_queries][: args.n_requests]
    n_serial = args.serialized_requests or args.n_requests
    report = {
        "task": {
            "n_decls": args.n_decls,
            "body_sentences": args.body_sentences,
            "cascade": args.cascade,
            "n_requests": args.n_requests,
            "limit": args.limit,
            "coalesce_ms": args.coalesce_ms,
            "note": "1-core bench host: HTTP client work contends with the "
            "server's host stages, so HTTP arms are conservative; the "
            "coalesced-vs-serialized RATIO is the designed-for comparison.",
        },
        "results": {},
    }

    # Warm every batch bucket like a production deployment (--warmup with
    # all_buckets): coalesced drains vary in size, and an unwarmed size
    # would bill an XLA compile to the timed arm.
    log("warmup (all batch buckets) ...")
    warm_ms = asyncio.run(service.warmup(batch=args.n_requests, all_buckets=True))
    log(f"warmup took {warm_ms} ms")
    asyncio.run(service.search_batch(queries, limit=args.limit))

    log("arm: direct search_batch ...")
    t0 = time.perf_counter()
    asyncio.run(service.search_batch(queries, limit=args.limit))
    direct_s = time.perf_counter() - t0
    report["results"]["direct_search_batch"] = {
        "seconds": round(direct_s, 2),
        "qps": round(args.n_requests / direct_s, 1),
    }
    log(json.dumps(report["results"]["direct_search_batch"]))

    for label, max_batch, n_reqs in (
        ("coalesced_http", args.n_requests, args.n_requests),
        ("serialized_http", 1, n_serial),
    ):
        server = serve(
            service,
            port=0,
            api_key="bench",
            coalesce_ms=args.coalesce_ms if max_batch > 1 else 0.0,
            max_batch=max_batch,
        )
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        base = f"http://127.0.0.1:{server.server_address[1]}/api/v2"
        log(f"arm: {label} ({n_reqs} concurrent requests) ...")
        elapsed = asyncio.run(_fire(base, queries[:n_reqs], args.limit))
        report["results"][label] = {
            "seconds": round(elapsed, 2),
            "qps": round(n_reqs / elapsed, 1),
            "engine_batches": server.batcher.batches_run,
            "engine_seconds": round(server.batcher.engine_seconds, 2),
            "engine_ms_per_request": round(
                1000 * server.batcher.engine_seconds / n_reqs, 1
            ),
            "batch_sizes": server.batcher.batch_sizes[:50],
            "requests": n_reqs,
        }
        log(json.dumps(report["results"][label]))
        server.shutdown()
        server.batcher.stop()
        thread.join(timeout=5)

    coalesced = report["results"]["coalesced_http"]["qps"]
    serialized = report["results"]["serialized_http"]["qps"]
    report["results"]["coalescing_speedup"] = round(coalesced / serialized, 2)

    args.out.write_text(json.dumps(report, indent=2))
    shutil.rmtree(work)
    print(json.dumps(report["results"]))


if __name__ == "__main__":
    main()
