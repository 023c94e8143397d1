"""MCP layer: first-party stdio JSON-RPC server + the 8 search tools."""

from lean_explore_tpu.mcp.jsonrpc import McpServer

__all__ = ["McpServer"]
