"""HTTP serving benchmark: what request coalescing buys on real hardware.

Measures the self-hosted /api/v2 server (lean_explore_tpu/api/server.py)
with trained weights at every stage, production-length documents, and the
validated rerank cascade, under three arms:

  direct      Service.search_batch(all queries) — no HTTP, the upper bound
  coalesced   N open-loop HTTP requests, one server with max_batch=N
  serialized  N open-loop HTTP requests, one server with max_batch=1
              (every request runs the single-query pipeline alone — what a
              non-batching HTTP front end would do)

The HTTP arms are driven by a SEPARATE stdlib-only client process
(scripts/http_openloop_client.py) that pre-serializes every request
before its clock starts and sleeps in epoll while the server computes:
the round-4 in-process async client preempted the server's host stages
on this 1-core host and inflated time-inside-search_batch 13x
(docs/performance.md "HTTP serving").

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
            "note": "HTTP arms driven open-loop from a separate "
            "stdlib-only process (scripts/http_openloop_client.py): "
            "requests pre-serialized before the clock, client asleep in "
            "epoll while the server computes. Residual 1-core cost in "
            "the HTTP arms is the server's own handler threads.",
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
        log(f"arm: {label} ({n_reqs} open-loop requests, external client) ...")
        # Round-4 lesson (runs/api_server_bench.json): an in-process async
        # client preempts the server's host stages on a 1-core host and
        # measures ITSELF (time-inside-search_batch inflated 13x). The
        # load now comes from a separate stdlib-only process that
        # pre-serializes all requests and sleeps in epoll while the
        # server computes (scripts/http_openloop_client.py).
        queries_file = work / f"queries_{label}.txt"
        queries_file.write_text("\n".join(queries[:n_reqs]))
        import subprocess

        client = subprocess.run(
            [
                sys.executable,
                str(Path(__file__).parent / "http_openloop_client.py"),
                base,
                str(queries_file),
                "--limit", str(args.limit),
                "--api-key", "bench",
            ],
            capture_output=True,
            text=True,
            timeout=900,
        )
        if client.returncode != 0:
            raise RuntimeError(
                f"open-loop client failed in arm {label}: "
                f"{client.stdout[-500:]} {client.stderr[-1000:]}"
            )
        fired = json.loads(client.stdout.strip())
        elapsed = fired["seconds"]
        report["results"][label] = {
            "seconds": round(elapsed, 2),
            "qps": round(n_reqs / elapsed, 1),
            "n_ok": fired["n_ok"],
            "latency_ms": fired["latency_ms"],
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
