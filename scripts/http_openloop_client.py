"""Open-loop raw-socket HTTP load client for the /api/v2 bench.

Built for a 1-core bench host: the round-4 in-process httpx arm measured
the CLIENT, not the server — 128 pending asyncio tasks preempted the
server's host stages and inflated time-inside-search_batch 13x
(runs/api_server_bench.json, docs/performance.md "HTTP serving"). This
client removes itself from the measurement:

  - runs as a SEPARATE process with zero heavy imports (stdlib only —
    no jax, no httpx), so startup is milliseconds and the interpreter
    owns no device state;
  - pre-serializes every request to raw bytes BEFORE the clock starts
    (equal offered load at t=0 — open loop, not closed loop);
  - uses non-blocking sockets + one ``selectors`` loop: while the server
    computes, this process is asleep in ``epoll``, not scheduling tasks;
  - sends ``Connection: close`` so response framing is read-until-EOF —
    no header parsing on the hot path;
  - validates responses (status 200, non-empty ``results``) only AFTER
    the clock stops.

Prints one JSON line: {"seconds", "qps", "n_ok", "latency_ms": {...}}.
Driven by scripts/bench_api_server.py; standalone use:

    python scripts/http_openloop_client.py http://127.0.0.1:8080/api/v2 \
        queries.txt --api-key bench --limit 10
"""

import argparse
import json
import selectors
import socket
import sys
import time
from urllib.parse import quote, urlsplit


def build_request(path: str, host: str, query: str, limit: int,
                  api_key: str | None) -> bytes:
    lines = [
        f"GET {path}/search?q={quote(query)}&limit={limit} HTTP/1.1",
        f"Host: {host}",
        "Connection: close",
    ]
    if api_key:
        lines.append(f"Authorization: Bearer {api_key}")
    return ("\r\n".join(lines) + "\r\n\r\n").encode()


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("base_url", help="e.g. http://127.0.0.1:8080/api/v2")
    parser.add_argument("queries_file", help="one query per line")
    parser.add_argument("--limit", type=int, default=10)
    parser.add_argument("--api-key", default=None)
    parser.add_argument("--timeout", type=float, default=600.0)
    args = parser.parse_args()

    split = urlsplit(args.base_url)
    host, port = split.hostname, split.port or 80
    queries = [
        q for q in open(args.queries_file).read().splitlines() if q.strip()
    ]

    requests = [
        build_request(split.path, f"{host}:{port}", q, args.limit, args.api_key)
        for q in queries
    ]

    sel = selectors.DefaultSelector()
    states = []  # per-connection: {sock, out, buf, t_done}
    t0 = time.perf_counter()
    for payload in requests:
        sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        sock.setblocking(False)
        try:
            sock.connect((host, port))
        except BlockingIOError:
            pass
        state = {"sock": sock, "out": payload, "buf": bytearray(),
                 "t_done": None}
        states.append(state)
        sel.register(sock, selectors.EVENT_WRITE, state)

    pending = len(states)
    deadline = t0 + args.timeout
    while pending and time.perf_counter() < deadline:
        for key, events in sel.select(timeout=deadline - time.perf_counter()):
            state = key.data
            sock = state["sock"]
            if events & selectors.EVENT_WRITE and state["out"]:
                try:
                    sent = sock.send(state["out"])
                except OSError:
                    # Refused/RST: retire the connection (leaving it
                    # registered would re-fire EVENT_WRITE every loop
                    # and busy-spin the 1-core host until --timeout).
                    # t_done stays None -> excluded from latencies;
                    # empty buf fails the 200-status check -> not ok.
                    sel.unregister(sock)
                    sock.close()
                    pending -= 1
                    continue
                state["out"] = state["out"][sent:]
                if not state["out"]:
                    sel.modify(sock, selectors.EVENT_READ, state)
            elif events & selectors.EVENT_READ:
                try:
                    chunk = sock.recv(65536)
                except OSError:
                    chunk = b""
                if chunk:
                    state["buf"] += chunk
                else:  # EOF — Connection: close framing
                    state["t_done"] = time.perf_counter()
                    sel.unregister(sock)
                    sock.close()
                    pending -= 1
    elapsed = time.perf_counter() - t0

    # Validation AFTER the clock: status 200 and a non-empty result set.
    n_ok = 0
    for state in states:
        raw = bytes(state["buf"])
        head, _, body = raw.partition(b"\r\n\r\n")
        status_line = head.split(b"\r\n", 1)[0]  # e.g. HTTP/1.1 200 OK
        parts = status_line.split()
        if len(parts) < 2 or not parts[0].startswith(b"HTTP/1.") or parts[1] != b"200":
            continue
        try:
            if json.loads(body)["results"]:
                n_ok += 1
        except (ValueError, KeyError):
            pass

    latencies = sorted(
        (s["t_done"] - t0) * 1000 for s in states if s["t_done"] is not None
    )

    def pct(p: float) -> float:
        return round(latencies[int(p * (len(latencies) - 1))], 1)

    print(json.dumps({
        "seconds": round(elapsed, 3),
        "qps": round(len(queries) / elapsed, 2),
        "n_requests": len(queries),
        "n_ok": n_ok,
        "latency_ms": (
            {"p50": pct(0.5), "p90": pct(0.9), "max": pct(1.0)}
            if latencies else None
        ),
    }))
    sys.exit(0 if n_ok == len(queries) else 1)


if __name__ == "__main__":
    main()
