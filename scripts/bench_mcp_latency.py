"""Warm single-query MCP tool-call latency on the product surface.

The MCP usage pattern is an AI assistant issuing ONE tool call at a time
against a persistent server — B=1 latency, not batch throughput. This
measures exactly that: a warmed `python -m lean_explore_tpu.mcp.server
--backend local` subprocess (trained weights at every stage,
production-length documents), driven line-by-line over stdio JSON-RPC,
timing each tools/call round trip.

Per arm it reports the measured decomposition

    tool-call wall = stdio/JSON-RPC overhead + server processing_time_ms

(the server's ``processing_time_ms`` is the reference's own latency
field, reference search/service.py:41-50) and the rerank stage's share
follows from the rerank_top=0 vs rerank_top=50 arms. The remaining
irreducible floor on this testbed is the axon RPC relay (~28 ms per
device dispatch, docs/performance.md) — a colocated TPU would not pay
it; each arm also records how many device dispatches a call makes so
that share can be read off.

    python scripts/bench_mcp_latency.py --out runs/mcp_latency.json

Phases (the measuring process itself never imports jax — ONE TPU
process at a time, and the 1-core host must be idle while the server
computes): ``--phase build`` embeds the corpus and writes artifacts,
then exits; the default phase spawns the build subprocess if needed,
then the server subprocess, then measures.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def build_phase(args) -> None:
    """Subprocess: make the corpus, embed with trained weights, write
    artifacts + the eval query list; exit (releasing the TPU)."""
    sys.path.insert(0, str(REPO))
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from lean_explore_tpu.index import build_index_artifacts
    from lean_explore_tpu.models import DeclarationStore
    from lean_explore_tpu.train.synthetic import make_corpus
    from lean_explore_tpu.util.embedding_client import EmbeddingClient

    corpus = make_corpus(
        n_decls=args.n_decls,
        n_concepts=args.n_concepts,
        n_eval=args.n_calls + 8,
        seed=args.seed,
        body_sentences=args.body_sentences,
    )
    work = Path(args.work)
    if work.exists():
        shutil.rmtree(work)
    work.mkdir(parents=True)
    store = DeclarationStore(work / "declarations.db", create=True)
    store.insert_many(corpus.declarations)

    emb = EmbeddingClient(
        str(args.embedder), max_length=args.emb_max_length, batch_size=256,
        dtype="float32",
    )
    ids, texts = [], []
    for decl in store.iter_all(with_embeddings=False):
        ids.append(decl.id)
        texts.append(decl.informalization)
    vecs = emb.embed_sync(texts, is_query=False)
    store.set_embeddings(list(zip(ids, (v.tolist() for v in vecs))))
    build_index_artifacts(store, work)
    (work / "queries.txt").write_text(
        "\n".join(q for q, _ in corpus.eval_queries)
    )
    log(f"artifacts built in {work}")


class McpSession:
    """Line-by-line stdio JSON-RPC to one MCP server subprocess."""

    def __init__(self, work: Path, env: dict, warmup: bool = True):
        cmd = [
            sys.executable, "-m", "lean_explore_tpu.mcp.server",
            "--backend", "local", "--data-dir", str(work),
        ]
        if warmup:
            cmd += ["--warmup", "--warmup-batch", "1"]
        self.proc = subprocess.Popen(
            cmd, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, env=env, text=True, cwd=REPO,
        )
        self._id = 0
        self._send({"method": "initialize", "params": {}}, wait=True)
        self._notify({"method": "notifications/initialized"})

    def _notify(self, msg: dict) -> None:
        msg = {"jsonrpc": "2.0", **msg}
        self.proc.stdin.write(json.dumps(msg) + "\n")
        self.proc.stdin.flush()

    def _send(self, msg: dict, wait: bool) -> dict | None:
        self._id += 1
        msg = {"jsonrpc": "2.0", "id": self._id, **msg}
        self.proc.stdin.write(json.dumps(msg) + "\n")
        self.proc.stdin.flush()
        if not wait:
            return None
        line = self.proc.stdout.readline()
        if not line:
            raise RuntimeError("MCP server closed stdout")
        return json.loads(line)

    def call(self, tool: str, arguments: dict) -> tuple[float, dict]:
        """One tools/call round trip -> (wall_seconds, payload dict)."""
        t0 = time.perf_counter()
        reply = self._send(
            {"method": "tools/call",
             "params": {"name": tool, "arguments": arguments}},
            wait=True,
        )
        wall = time.perf_counter() - t0
        if "error" in reply:
            raise RuntimeError(f"tool error: {reply['error']}")
        return wall, json.loads(reply["result"]["content"][0]["text"])

    def close(self) -> None:
        self.proc.stdin.close()
        self.proc.wait(timeout=30)


def percentile(values: list[float], p: float) -> float:
    ordered = sorted(values)
    return ordered[int(p * (len(ordered) - 1))]


def measure_arm(session: McpSession, tool: str, queries: list[str],
                rerank_top: int, n_warm: int = 3) -> dict:
    walls, processing = [], []
    for i, query in enumerate(queries):
        args = {"query": query, "limit": 10, "rerank_top": rerank_top}
        wall, payload = session.call(tool, args)
        if i < n_warm:  # first calls pay padded-shape compiles
            continue
        walls.append(wall * 1000)
        if payload.get("processing_time_ms") is not None:
            processing.append(float(payload["processing_time_ms"]))
    row = {
        "n_measured": len(walls),
        "wall_ms": {
            "p50": round(percentile(walls, 0.5), 1),
            "p90": round(percentile(walls, 0.9), 1),
            "mean": round(sum(walls) / len(walls), 1),
        },
    }
    if processing:
        row["processing_ms_p50"] = round(percentile(processing, 0.5), 1)
        row["stdio_overhead_ms_p50"] = round(
            percentile(walls, 0.5) - percentile(processing, 0.5), 1
        )
    return row


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--phase", choices=("measure", "build"),
                        default="measure")
    parser.add_argument("--out", type=Path,
                        default=Path("runs/mcp_latency.json"))
    parser.add_argument("--work", type=Path,
                        default=Path("runs/mcp_latency_work"))
    parser.add_argument(
        "--embedder", type=Path,
        default=Path("runs/longdoc/embedder/checkpoint"),
    )
    parser.add_argument(
        "--reranker", type=Path,
        default=Path("runs/longdoc/reranker/checkpoint"),
    )
    parser.add_argument("--n-decls", type=int, default=20_000)
    parser.add_argument("--n-concepts", type=int, default=1200)
    parser.add_argument("--body-sentences", type=int, default=5)
    parser.add_argument("--emb-max-length", type=int, default=128)
    parser.add_argument("--rr-max-length", type=int, default=192)
    parser.add_argument("--cascade", type=str, default="24,8")
    parser.add_argument("--n-calls", type=int, default=24)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", choices=("cpu", "tpu"), default="tpu")
    parser.add_argument("--keep-work", action="store_true")
    args = parser.parse_args()

    if args.phase == "build":
        build_phase(args)
        return

    if not (args.work / "manifest.json").exists() or not (
        args.work / "queries.txt"
    ).exists():
        log("building artifacts (subprocess) ...")
        # --phase build goes LAST: argparse takes the final occurrence,
        # so a caller's explicit --phase measure cannot leak into the
        # child and recurse.
        build = subprocess.run(
            [sys.executable, __file__]
            + [a for a in sys.argv[1:] if a != "--keep-work"]
            + ["--phase", "build"],
            cwd=REPO, timeout=3600,
        )
        if build.returncode != 0:
            raise SystemExit("build phase failed")

    queries = (args.work / "queries.txt").read_text().splitlines()
    queries = queries[: args.n_calls + 3]  # +3 unmeasured warm calls

    env = dict(os.environ)
    env["LEAN_EXPLORE_EMBEDDING_MODEL"] = str(args.embedder)
    env["LEAN_EXPLORE_RERANKER_MODEL"] = str(args.reranker)
    env["LEAN_EXPLORE_EMBEDDING_MAX_LENGTH"] = str(args.emb_max_length)
    env["LEAN_EXPLORE_RERANKER_MAX_LENGTH"] = str(args.rr_max_length)
    env.pop("LEAN_EXPLORE_RERANK_CASCADE", None)
    if args.platform == "cpu":
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.pop("JAX_PLATFORMS", None)

    report = {
        "task": {
            "surface": "MCP tools/call over stdio, persistent warmed server",
            "n_decls": args.n_decls,
            "body_sentences": args.body_sentences,
            "n_calls_per_arm": args.n_calls,
            "cascade": args.cascade,
            "note": "wall = stdio JSON-RPC round trip as an MCP client "
            "sees it; processing_ms = the server's own "
            "processing_time_ms (the reference's latency field); "
            "stdio_overhead = wall - processing. Device-dispatch RPC "
            "relay (~28 ms/dispatch on this testbed) is inside "
            "processing_ms and would vanish on a colocated TPU.",
        },
        "results": {},
    }

    # Arm order: rerank-free first (isolates encode+dense+fusion), then
    # the full rerank pipeline, then the summary tool. A fresh server per
    # cascade setting (the client reads the env at construction).
    log("starting MCP server (cascade off) ...")
    session = McpSession(args.work, env)
    for label, tool, rerank_top in (
        ("search_rerank0", "search", 0),
        ("search_rerank50", "search", 50),
        ("search_summary_rerank50", "search_summary", 50),
    ):
        log(f"arm: {label} ...")
        report["results"][label] = measure_arm(
            session, tool, queries, rerank_top
        )
        log(json.dumps(report["results"][label]))
    session.close()

    env_cascade = dict(env)
    env_cascade["LEAN_EXPLORE_RERANK_CASCADE"] = args.cascade
    log("starting MCP server (cascade on) ...")
    session = McpSession(args.work, env_cascade)
    label = f"search_rerank50_cascade_{args.cascade.replace(',', '_')}"
    log(f"arm: {label} ...")
    report["results"][label] = measure_arm(session, "search", queries, 50)
    log(json.dumps(report["results"][label]))
    session.close()

    args.out.write_text(json.dumps(report, indent=2))
    if not args.keep_work:
        shutil.rmtree(args.work)
    print(json.dumps(report["results"]))


if __name__ == "__main__":
    main()
