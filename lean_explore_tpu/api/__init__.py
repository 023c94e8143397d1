"""Remote API layer: client for hosted deployments, self-hosted server.

The server is import-lazy (it pulls in the search stack); access it as
``lean_explore_tpu.api.server`` or via ``python -m lean_explore_tpu.api.server``.
"""

from lean_explore_tpu.api.client import ApiClient

__all__ = ["ApiClient"]
