"""MCP application instance and backend wiring.

Parity surface: reference mcp/app.py:16-92 — the same server name and
instructions, the same duck-typed backend slot (local Service or remote
ApiClient), minus the FastMCP lifespan machinery (the backend attaches
directly before run).
"""

import logging
from typing import Any

from lean_explore_tpu import __version__
from lean_explore_tpu.mcp.jsonrpc import McpServer

logger = logging.getLogger(__name__)

# Duck-typed: anything with async search(query, limit, rerank_top, packages)
# and async get_by_id(declaration_id).
BackendServiceType = Any

INSTRUCTIONS = (
    "MCP Server for searching Lean 4 mathematical declarations (theorems, "
    "definitions, lemmas, instances, etc.) from Mathlib and other Lean "
    "packages.\n\n"
    "The search engine is hybrid: it matches by declaration name (e.g., "
    "'List.map', 'Nat.add') AND by informal natural language meaning (e.g., "
    "'a continuous function on a compact set', 'prime number divisibility'). "
    "You can use either style of query.\n\n"
    "Recommended workflow:\n"
    "1. Use search_summary to browse results (low token cost).\n"
    "2. Use per-field tools to fetch only what you need:\n"
    "   - get_source_code: Lean source code\n"
    "   - get_source_link: GitHub link to source\n"
    "   - get_docstring: documentation string\n"
    "   - get_description: natural language description\n"
    "   - get_module: module path in the package\n"
    "   - get_dependencies: declarations this depends on\n"
    "3. Use search only when you need full details for all results "
    "at once."
)

mcp_app = McpServer(
    name="LeanExploreMCPServer",
    version=__version__,
    instructions=INSTRUCTIONS,
)

_backend_service: BackendServiceType | None = None


def set_backend_service(service: BackendServiceType) -> None:
    """Attach the backend the tools will call."""
    global _backend_service
    _backend_service = service
    logger.info("Backend service attached: %s", type(service).__name__)


def get_backend_service() -> BackendServiceType:
    if _backend_service is None:
        raise RuntimeError(
            "Backend service not initialized for MCP app. Run via "
            "'python -m lean_explore_tpu.mcp.server --backend local|api'."
        )
    return _backend_service
