"""MCP server entry point: ``python -m lean_explore_tpu.mcp.server``.

Parity surface: reference mcp/server.py:97-228 — ``--backend {api,local}``,
``--api-key``, ``--log-level``; stderr logging so stdout stays pure
JSON-RPC; data pre-flight checks with clean exit codes.
"""

import argparse
import logging
import sys

from lean_explore_tpu.config import Config

logger = logging.getLogger(__name__)


def _parse_arguments(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Lean Explore MCP Server. Provides Lean search tools via MCP."
    )
    parser.add_argument(
        "--backend",
        type=str,
        choices=["api", "local"],
        required=True,
        help="'api' for the remote API, 'local' for local TPU index data.",
    )
    parser.add_argument(
        "--api-key",
        type=str,
        default=None,
        help="API key for the remote backend (required with --backend api).",
    )
    parser.add_argument(
        "--log-level",
        type=str,
        choices=["DEBUG", "INFO", "WARNING", "ERROR", "CRITICAL"],
        default="ERROR",
        help="Logging level (default: ERROR).",
    )
    parser.add_argument(
        "--data-dir",
        type=str,
        default=None,
        help="Index artifact directory (default: configured cache path).",
    )
    parser.add_argument(
        "--warmup",
        action="store_true",
        help="Compile the serving programs (encode/dense/rerank) before "
        "accepting requests, so the first tool call is fast (local backend).",
    )
    parser.add_argument(
        "--warmup-batch",
        type=int,
        default=1,
        help="Warm with this many queries (compiled programs are keyed on "
        "padded batch shapes; match your expected request batching).",
    )
    return parser.parse_args(argv)


def build_backend(args: argparse.Namespace):
    """Construct the backend service or exit with a clean error."""
    if args.backend == "local":
        data_dir = args.data_dir or Config.ACTIVE_CACHE_PATH
        from pathlib import Path

        if not (Path(data_dir) / "declarations.db").exists():
            print(
                "Error: Essential data files for the local backend are "
                "missing.\nPlease run `lean-explore data fetch` to download "
                f"the data, or pass --data-dir.\nExpected directory: {data_dir}",
                file=sys.stderr,
            )
            raise SystemExit(1)
        try:
            from lean_explore_tpu.search import SearchEngine, Service

            engine = SearchEngine(data_dir)
            return Service(engine=engine)
        except FileNotFoundError as exc:
            logger.critical("Local backend initialization failed: %s", exc)
            raise SystemExit(1) from exc
    else:
        if not args.api_key:
            logger.error("--api-key is required when using the 'api' backend.")
            raise SystemExit(1)
        from lean_explore_tpu.api import ApiClient

        return ApiClient(api_key=args.api_key)


def main(argv=None) -> None:
    args = _parse_arguments(argv)
    logging.basicConfig(
        level=getattr(logging, args.log_level.upper(), logging.ERROR),
        format="%(asctime)s - %(levelname)s - [%(name)s:%(lineno)d] - %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
        stream=sys.stderr,
        force=True,
    )
    logger.info("Starting Lean Explore MCP server (backend=%s)", args.backend)

    backend = build_backend(args)

    if args.warmup and hasattr(backend, "warmup"):
        import asyncio

        logger.info("Warming serving programs ...")
        elapsed_ms = asyncio.run(backend.warmup(batch=args.warmup_batch))
        logger.info("Warmup done in %d ms", elapsed_ms)

    from lean_explore_tpu.mcp import tools  # noqa: F401 — registers tools
    from lean_explore_tpu.mcp.app import mcp_app, set_backend_service

    set_backend_service(backend)
    try:
        mcp_app.run_stdio()
    except KeyboardInterrupt:
        logger.info("Interrupted; shutting down")
    finally:
        logger.info("MCP server has shut down.")


if __name__ == "__main__":
    main()
