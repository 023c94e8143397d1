"""``lean-explore`` CLI (reference cli/main.py surface on click).

Commands:
    search           remote-API search (or --local for the TPU backend)
    mcp serve        spawn the MCP stdio server subprocess
    data fetch/clean manage downloaded index artifacts
"""

import asyncio
import logging
import os
import subprocess
import sys

import click
from rich.console import Console

from lean_explore_tpu.cli.data_commands import data_group
from lean_explore_tpu.cli.display import display_search_results

logger = logging.getLogger(__name__)


@click.group(name="lean-explore")
def cli():
    """Explore and search Lean mathematical libraries (TPU-native backend)."""


@cli.command("search")
@click.argument("query_string")
@click.option("--limit", "-n", default=5, show_default=True, help="Results to show.")
@click.option(
    "--package",
    "-p",
    "packages",
    multiple=True,
    help="Filter by package (repeatable, e.g. -p Mathlib -p Std).",
)
@click.option(
    "--local",
    "use_local",
    is_flag=True,
    help="Serve from local index artifacts on this machine's TPU instead of "
    "the remote API.",
)
@click.option(
    "--data-dir",
    default=None,
    help="Index artifact directory for --local (default: configured cache).",
)
@click.option(
    "--rerank-top",
    default=50,
    show_default=True,
    help="Cross-encoder rerank pool for --local (0 disables).",
)
def search_command(query_string, limit, packages, use_local, data_dir, rerank_top):
    """Search for Lean declarations."""
    asyncio.run(
        _search_async(
            query_string,
            limit,
            list(packages) or None,
            use_local,
            data_dir,
            rerank_top,
        )
    )


async def _search_async(query, limit, packages, use_local, data_dir, rerank_top):
    console = Console()
    errors = Console(stderr=True)
    if use_local:
        try:
            from lean_explore_tpu.search import SearchEngine, Service

            service = Service(engine=SearchEngine(data_dir))
        except FileNotFoundError as error:
            errors.print(f"[bold red]Error: {error}[/bold red]")
            raise SystemExit(1) from error
        console.print(f"Searching locally for: '{query}'...")
        response = await service.search(
            query=query, limit=limit, rerank_top=rerank_top, packages=packages
        )
    else:
        from lean_explore_tpu.api import ApiClient

        try:
            client = ApiClient()
        except ValueError as error:
            errors.print(f"[bold red]Error: {error}[/bold red]")
            raise SystemExit(1) from error
        console.print(f"Searching for: '{query}'...")
        response = await client.search(query=query, limit=limit, packages=packages)
    display_search_results(response, display_limit=limit, console=console)


@cli.group(name="mcp")
def mcp_group():
    """Manage and run the Model Context Protocol (MCP) server."""


@mcp_group.command("serve")
@click.option(
    "--backend",
    "-b",
    type=click.Choice(["api", "local"], case_sensitive=False),
    default="api",
    show_default=True,
    help="Backend for the MCP server.",
)
@click.option("--api-key", default=None, help="API key override for 'api' backend.")
@click.option("--data-dir", default=None, help="Artifact dir for 'local' backend.")
def mcp_serve_command(backend, api_key, data_dir):
    """Launch the MCP server as a stdio subprocess."""
    errors = Console(stderr=True)
    backend = backend.lower()
    command = [
        sys.executable,
        "-m",
        "lean_explore_tpu.mcp.server",
        "--backend",
        backend,
    ]
    if backend == "api":
        effective_key = api_key or os.getenv("LEANEXPLORE_API_KEY")
        if not effective_key:
            errors.print(
                "[bold red]API key required for 'api' backend.[/bold red]\n"
                "Set LEANEXPLORE_API_KEY or use --api-key."
            )
            raise SystemExit(1)
        if api_key:
            command.extend(["--api-key", api_key])
    if data_dir:
        command.extend(["--data-dir", data_dir])

    logger.info("Starting MCP server (backend=%s)", backend)
    result = subprocess.run(command, check=False)
    if result.returncode != 0:
        raise SystemExit(result.returncode)


@cli.group(name="api")
def api_group():
    """Run the self-hosted HTTP search API (/api/v2)."""


@api_group.command("serve")
@click.option("--data-dir", default=None, help="Index artifact directory.")
@click.option("--host", default="127.0.0.1", show_default=True)
@click.option("--port", default=8080, show_default=True)
@click.option(
    "--api-key",
    default=None,
    help="Require 'Authorization: Bearer <key>' on API routes.",
)
@click.option(
    "--coalesce-ms",
    default=5.0,
    show_default=True,
    help="Request-coalescing window; concurrent queries share device batches.",
)
@click.option("--warmup", is_flag=True, help="Compile serving programs first.")
@click.option("--warmup-batch", default=1, show_default=True)
def api_serve_command(data_dir, host, port, api_key, coalesce_ms, warmup, warmup_batch):
    """Serve the openapi.yaml contract over the local TPU index, so
    ApiClient / `lean-explore search` / `mcp serve --backend api` can point
    at your own deployment instead of leanexplore.com."""
    from lean_explore_tpu.api.server import main as server_main

    argv = ["--host", host, "--port", str(port), "--coalesce-ms", str(coalesce_ms)]
    if data_dir:
        argv.extend(["--data-dir", data_dir])
    if api_key:
        argv.extend(["--api-key", api_key])
    if warmup:
        argv.extend(["--warmup", "--warmup-batch", str(warmup_batch)])
    server_main(argv)


cli.add_command(data_group)


if __name__ == "__main__":
    cli()
