"""First-party MCP (Model Context Protocol) stdio server.

The reference rides the FastMCP SDK (mcp/app.py:69-92); that SDK is not part
of this framework's dependency set, so the protocol is implemented directly:
JSON-RPC 2.0 messages, one JSON object per line, over stdin/stdout
(stdout carries nothing else; logs go to stderr — reference server.py:33-38).

Implemented methods: ``initialize``, ``notifications/initialized``, ``ping``,
``tools/list``, ``tools/call``. Tool results are returned both as MCP text
content (JSON-encoded) and ``structuredContent``.
"""

import asyncio
import json
import logging
import sys
from dataclasses import dataclass, field
from typing import Any, Awaitable, Callable

logger = logging.getLogger(__name__)

PROTOCOL_VERSION = "2025-03-26"

PARSE_ERROR = -32700
INVALID_REQUEST = -32600
METHOD_NOT_FOUND = -32601
INVALID_PARAMS = -32602
INTERNAL_ERROR = -32603


@dataclass
class Tool:
    """One registered MCP tool."""

    name: str
    description: str
    input_schema: dict
    handler: Callable[..., Awaitable[Any]]

    def descriptor(self) -> dict:
        return {
            "name": self.name,
            "description": self.description,
            "inputSchema": self.input_schema,
        }


@dataclass
class McpServer:
    """Minimal MCP server over stdio."""

    name: str
    version: str
    instructions: str = ""
    tools: dict[str, Tool] = field(default_factory=dict)

    def tool(self, *, name: str, description: str, input_schema: dict):
        """Decorator registering an async tool handler(**arguments)."""

        def register(fn: Callable[..., Awaitable[Any]]):
            self.tools[name] = Tool(name, description, input_schema, fn)
            return fn

        return register

    # ------------------------------------------------------------------
    # Message handling
    # ------------------------------------------------------------------

    async def handle_message(self, message) -> dict | None:
        """Process one JSON-RPC message; None for notifications.

        Malformed-but-valid-JSON shapes (arrays — batching is not
        supported — or a non-string method) answer INVALID_REQUEST rather
        than raising: one bad client message must never kill the server
        loop."""
        if not isinstance(message, dict):
            return _error(None, INVALID_REQUEST, "expected a request object")
        msg_id = message.get("id")
        method = message.get("method")

        if not isinstance(method, str):
            if msg_id is None:
                return None
            return _error(msg_id, INVALID_REQUEST, "missing or invalid method")

        if method.startswith("notifications/"):
            return None
        if msg_id is None:
            # JSON-RPC 2.0: a request without an id is a notification and
            # MUST NOT be answered (an id:null reply would be misrouted).
            return None

        try:
            if method == "initialize":
                return _result(
                    msg_id,
                    {
                        "protocolVersion": PROTOCOL_VERSION,
                        "capabilities": {"tools": {"listChanged": False}},
                        "serverInfo": {"name": self.name, "version": self.version},
                        "instructions": self.instructions,
                    },
                )
            if method == "ping":
                return _result(msg_id, {})
            if method == "tools/list":
                return _result(
                    msg_id,
                    {"tools": [t.descriptor() for t in self.tools.values()]},
                )
            if method == "tools/call":
                return await self._call_tool(msg_id, message.get("params") or {})
            return _error(msg_id, METHOD_NOT_FOUND, f"unknown method {method!r}")
        except Exception as exc:  # noqa: BLE001 — protocol boundary
            logger.exception("error handling %s", method)
            return _error(msg_id, INTERNAL_ERROR, str(exc))

    async def _call_tool(self, msg_id, params: dict) -> dict:
        tool_name = params.get("name")
        tool = self.tools.get(tool_name or "")
        if tool is None:
            return _error(msg_id, INVALID_PARAMS, f"unknown tool {tool_name!r}")
        arguments = params.get("arguments") or {}
        try:
            # Bind arguments FIRST so the TypeError guard covers only
            # signature mismatches (invalid params); a TypeError raised
            # inside the running tool/backend is a real bug and must reach
            # the generic branch below, where it is logged.
            try:
                pending = tool.handler(**arguments)
            except TypeError as exc:
                return _error(msg_id, INVALID_PARAMS, str(exc))
            output = await pending
        except Exception as exc:  # noqa: BLE001 — tool errors go in-band
            logger.exception("tool %s failed", tool_name)
            return _result(
                msg_id,
                {
                    "content": [{"type": "text", "text": f"Error: {exc}"}],
                    "isError": True,
                },
            )
        result: dict = {
            "content": [
                {"type": "text", "text": json.dumps(output, ensure_ascii=False)}
            ],
            "isError": False,
        }
        if isinstance(output, dict):
            # Optional per the MCP schema: omit rather than emit null
            # (the official SDKs validate z.object().optional(), which
            # rejects an explicit null).
            result["structuredContent"] = output
        return _result(msg_id, result)

    # ------------------------------------------------------------------
    # stdio transport
    # ------------------------------------------------------------------

    def run_stdio(self, stdin=None, stdout=None) -> None:
        """Blocking request loop: one JSON object per line.

        One long-lived event loop serves every message (asyncio.run per
        request paid a loop + default-executor teardown on the hot path
        and prevented backends from caching loop-bound state); stdin is
        read via to_thread so the loop stays responsive.
        """
        stdin = stdin or sys.stdin
        stdout = stdout or sys.stdout
        logger.info("MCP server %s listening on stdio", self.name)

        async def _serve() -> None:
            while True:
                line = await asyncio.to_thread(stdin.readline)
                if not line:
                    break
                line = line.strip()
                if not line:
                    continue
                try:
                    message = json.loads(line)
                except json.JSONDecodeError as exc:
                    _write(stdout, _error(None, PARSE_ERROR, f"parse error: {exc}"))
                    continue
                response = await self.handle_message(message)
                if response is not None:
                    _write(stdout, response)

        asyncio.run(_serve())
        logger.info("MCP stdin closed; shutting down")


def _result(msg_id, result: dict) -> dict:
    return {"jsonrpc": "2.0", "id": msg_id, "result": result}


def _error(msg_id, code: int, message: str) -> dict:
    return {"jsonrpc": "2.0", "id": msg_id, "error": {"code": code, "message": message}}


def _write(stdout, payload: dict) -> None:
    stdout.write(json.dumps(payload, ensure_ascii=False) + "\n")
    stdout.flush()
